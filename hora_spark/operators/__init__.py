"""Engine operators: corpus prep, brute-force oracle, index build, WAND
query, dedup, similarity search, text analysis, multimodal plumbing.

Each module cites the reference behavior it mirrors (hora's index lifecycle
at /root/reference/src/core/ann_index.rs and the five physical indexes under
/root/reference/src/index/)."""
