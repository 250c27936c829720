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


def _install_ray_schema_warning_filter() -> None:
    """Silence ONE specific cosmetic Ray Data warning: the streaming
    executor logs "Operator produced a RefBundle with a different schema"
    whenever a sort-based ``groupby(...).map_groups`` leaves an EMPTY sort
    partition — Ray itself emits those empty partitions as schemaless
    (0-column) blocks, which our UDFs never see and cannot type (verified:
    a plain ``ray.data.range(...).groupby(low-cardinality key)
    .map_groups(identity)`` with more input blocks than keys reproduces it
    with no user code involved). Every OUR empty-result path emits typed
    empty tables (MATCH_SCHEMA.empty_table() / typed pd.Series); this
    filter only drops the Ray-internal schemaless-empty-partition case so
    real schema divergences in user pipelines still surface."""
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            # drop only the empty-schema variants (a 0-column bundle,
            # rendered "new schema: ." for Arrow blocks and
            # "PandasBlockSchema(names=[], types=[])" for pandas blocks);
            # keep warnings where both schemas are real
            return not (
                "RefBundle with a different schema" in msg
                and (
                    "new schema: ." in msg
                    or "new schema: PandasBlockSchema(names=[], types=[])"
                    in msg
                )
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())

    class _HashF(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            # read-PLANNING-time only: ray.data.read_parquet unifies the
            # on-disk file schemas, and pandas-written parquet (the driver's
            # read-only testdata) embeds a b'pandas' metadata dict that is
            # unhashable in this pyarrow build. Every block OUR stages emit
            # is metadata-free (sources.read_parquet_clean strips at the
            # read; bucketed_group_apply emits clean Arrow), so the shuffle
            # schema-dedup early exit still works on the data path — this
            # drops only the cosmetic planning warning we cannot fix without
            # writing to the read-only inputs.
            return "Failed to hash the schemas (for deduplication)" not in (
                record.getMessage()
            )

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_HashF())


_install_ray_schema_warning_filter()

# Conflation thresholds — conformance constants from the reference
# (scripts/match.py:191-192).
BUFFER_DISTANCE_M = 100.0
SIMILARITY_THRESHOLD = 0.6

# Spatial partition key: square grid in EPSG:3857 meters. The cell edge must
# exceed BUFFER_DISTANCE_M so a k-ring-1 neighborhood covers the match radius
# (role of H3 res-9 in SURVEY.md §2.4-J1; implemented as a pure-numpy
# web-mercator grid because no H3/S2 library is available).
CELL_SIZE_M = 256.0
