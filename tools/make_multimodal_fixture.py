#!/usr/bin/env python
"""Regenerate tests/fixtures/multimodal_expected.parquet — the DuckDB
oracle for the driver's multimodal_features query. Pure numpy/pandas (no
Spark): the fixture is the local single-process run of the same decoders
over the same deterministic synth_media(seed=42) payloads.

Run after any change to the decoders or synth_media; a pytest
(test_pipeline_ops.py::test_multimodal_fixture_is_current) fails if the
committed fixture drifts from the code."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from hora_spark.operators.multimodal import expected_features_local

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "fixtures", "multimodal_expected.parquet")

if __name__ == "__main__":
    pdf = expected_features_local(n=60, seed=42)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} rows -> {os.path.normpath(OUT)}")
