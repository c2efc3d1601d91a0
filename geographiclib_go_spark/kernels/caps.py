"""Capability bitmask — the engine's compute-pruning contract.

Semantics match the reference's capabilities mask
(/root/reference/geodesic/capabilities/capabilities.go:15-68): each
output bit ORs in the internal series (C1/C1p/C2/C3/C4) it needs, so a
kernel invoked with a mask computes only the arrays required.  This is
the kernel-side analog of Catalyst column pruning: Catalyst prunes
unused top-level columns for free, but cannot see inside a
struct-returning Python UDF, so the mask is baked into UDF construction
at plan-build time.
"""

C1 = 1 << 0
C1P = 1 << 1
C2 = 1 << 2
C3 = 1 << 3
C4 = 1 << 4
ALL_CAPS = 0x1F

OUT_ALL = 0x7F80
OUT_MASK = 0xFF80  # include LONG_UNROLL

NONE = 0
LATITUDE = 1 << 7
LONGITUDE = 1 << 8 | C3
AZIMUTH = 1 << 9
DISTANCE = 1 << 10 | C1
STANDARD = LATITUDE | LONGITUDE | AZIMUTH | DISTANCE
DISTANCE_IN = 1 << 11 | C1 | C1P
REDUCED_LENGTH = 1 << 12 | C1 | C2
GEODESIC_SCALE = 1 << 13 | C1 | C2
AREA = 1 << 14 | C4
ALL = OUT_ALL | ALL_CAPS
LONG_UNROLL = 1 << 15
