"""Training-data pipeline operators beyond the reference's surface:
deduplication (exact / minhash-LSH / simhash), approximate nearest-neighbor
search over embedding columns, text analysis (language id, quality scoring,
token counts, fingerprints), and multimodal column plumbing.

These reuse the engine's core kernels (kgx.link.minhash, kgx.canon.cc) —
the same LSH + connected-components machinery that powers entity linking
powers corpus-level near-dup clustering at 100 TB.
"""
