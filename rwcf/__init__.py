"""rwcf — Ray-Data-native columnar codec engine.

A brand-new per-column lightweight-compression engine with the query /
data-processing capabilities of the reference educational columnar format
(wmedrano/wills-columnar-format, read-only at /root/reference): byte-exact
bincode-varint value encoding, optional run-length encoding, >=2048-byte
greedy pages and a self-describing footer — plus the north-rule extensions:
dictionary encoding, bit-packing, frame-of-reference, FSST-style string
compression, a sampling-based per-partition codec auto-selector, lineage
manifests with resume, all expressed as vectorized Arrow kernels driven by
ray.data.Dataset pipelines.
"""

__version__ = "0.1.0"
