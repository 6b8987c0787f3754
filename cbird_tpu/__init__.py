"""cbird-tpu: TPU-native content-based image/video duplicate detection.

A brand-new framework with the capabilities of scrubbbbs/cbird (reference:
C++17/Qt6/OpenCV), re-designed TPU-first:

- compute kernels (perceptual DCT hashing, color descriptors, ORB-style
  features, video frame hashing) are batched JAX/XLA/Pallas programs that
  run on the MXU/VPU instead of scalar CPU loops;
- search structures (VP-tree, HammingTree, RadixMap in the reference) are
  replaced by HBM-resident packed arrays scanned with batched XOR-popcount
  kernels, sharded across chips with jax.sharding + shard_map;
- a thin Python host layer handles filesystem walking, codec decode, SQLite
  metadata, and the cbird-compatible CLI surface.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
    cli/      argument interpreter (-update, -similar, -p.*, -i.*)
    host/     engine, scanner (ingest pipeline), video decode backends
    store/    SQLite metadata, media model, io utilities
    index/    the five search indexes (dct, fdct, orb, color, video)
    ops/      device kernels (hashing, hamming scan, color, orb, autocrop)
    parallel/ device mesh + sharded scan / top-k merge collectives
"""

__version__ = "0.1.0"
