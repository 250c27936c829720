"""overmatch_ray — a Ray-Data-native OSM↔Overture conflation + tiling engine.

Rebuilt from scratch with the query/data-processing capabilities of the
reference engine (EMH333/overmatch, surveyed in SURVEY.md), expressed as
idiomatic Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, explicit
cell-partitioned shuffles for the wide spatial joins.

Pure-dependency policy: only ray[data] / pyarrow / pandas / numpy (no
shapely, h3, rapidfuzz, PIL) — every kernel here is vectorized numpy or
pyarrow.compute.

NOTE: this package never calls ``ray.init()`` / ``ray.shutdown()`` — the
session is owned by the driver, bench.py, or the test fixture.
"""

__version__ = "0.1.0"

# Conflation thresholds — conformance constants from the reference
# (scripts/match.py:191-192).
BUFFER_DISTANCE_M = 100.0
SIMILARITY_THRESHOLD = 0.6

# Spatial partition key: square grid in EPSG:3857 meters. The cell edge must
# exceed BUFFER_DISTANCE_M so a k-ring-1 neighborhood covers the match radius
# (role of H3 res-9 in SURVEY.md §2.4-J1; implemented as a pure-numpy
# web-mercator grid because no H3/S2 library is available).
CELL_SIZE_M = 256.0
