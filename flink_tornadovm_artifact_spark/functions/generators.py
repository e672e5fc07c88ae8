"""Gelly graph generators (``flink-gelly/.../graph/generator/``):
deterministic graph families built from ``spark.range`` + expressions —
no driver-side materialization, so a 2^40-vertex graph is as cheap to
declare as a 2^4 one (the generator emits edges at scan parallelism,
exactly like the reference's ``fromParallelCollection → flatMap``
pipelines).

Reference semantics implemented 1:1:

- ``CirculantGraph.java:119-158``: vertex ``s`` links to
  ``(s + offset + i) % n`` for each configured offset range — the
  base family; Complete and Echo are configured instances
  (``CompleteGraph.java:57``, ``EchoGraph.java:76``).
- ``GridGraph.java:126-161``: per-dimension ±increment neighbors with
  optional endpoint wrap; Cycle / Path / Hypercube are configured
  instances (``CycleGraph.java:59``, ``PathGraph.java:62``,
  ``HypercubeGraph.java:61-64``; wrap is dropped for size-2 dimensions
  per ``GridGraph.java:78``).
- ``StarGraph.java``, ``SingletonEdgeGraph.java``, ``EmptyGraph.java``:
  direct constructions.
- ``RMatGraph.java`` (Chakrabarti et al., SIAM '04): recursive-quadrant
  power-law multigraph; the reference draws from commons-math RNGs — we
  substitute a seeded md5-derived uniform per (edge, bit) so the graph
  is a pure function of (seed, scale, edge_count), reproducible across
  cluster sizes (the reference's per-split RNG streams are not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .gelly_graph import Graph


#: Rows per range partition (round 12, guide §2.2/§6): ``spark.range``
#: defaults to ``defaultParallelism`` partitions regardless of row
#: count, so a 2^10-vertex generator scheduled 32 near-empty tasks per
#: union branch (GridGraph: 20 branches -> ~640 tasks of ~32 rows,
#: pure scheduler overhead — measured on generator_hypercube_degrees).
#: Sizing the partition count from the row count keeps small generators
#: at a handful of tasks while a 2^30-vertex graph still fans out to
#: thousands — the scale-adaptive rule, derived from data not cluster.
_RANGE_ROWS_PER_PARTITION = 1 << 18


def _range(spark: SparkSession, start: int, end: int | None = None):
    if end is None:
        start, end = 0, start
    n_parts = max(1, -(-(end - start) // _RANGE_ROWS_PER_PARTITION))
    return spark.range(start, end, numPartitions=n_parts)


def _vertices(spark: SparkSession, n: int) -> DataFrame:
    return _range(spark, n).select(F.col("id"))


def _empty_edges(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "src long, dst long")


def circulant_graph(
    spark: SparkSession, vertex_count: int, ranges: list[tuple[int, int]]
) -> Graph:
    """CirculantGraph.java: ``addRange(offset, length)`` links every
    vertex s to (s + offset + i) % n for i in [0, length). Validation
    mirrors the reference: offset >= 1, length <= n - offset, ranges
    must not overlap (CirculantGraph.java:81-113)."""
    if vertex_count < 1:
        raise ValueError("vertex count must be at least 1")
    if not ranges:
        raise ValueError("at least one offset range is required")
    for off, length in ranges:
        if off < 1:
            raise ValueError("range offset must be at least 1")
        if length > vertex_count - off:
            raise ValueError(
                "range length must not be greater than the vertex count "
                "minus the range offset"
            )
    srt = sorted(ranges)
    for (o1, l1), (o2, _l2) in zip(srt, srt[1:]):
        if o1 + l1 > o2:
            raise ValueError(f"overlapping ranges {(o1, l1)} and {(o2, _l2)}")
    # only the COMPACT (offset, length) pairs touch the driver (the
    # reference ships the same OffsetRange list inside its flatMap
    # closure); each range expands to offsets at scan parallelism via
    # spark.range, so complete_graph(2^30) never materializes a
    # 2^30-element list driver-side
    off_df = _range(spark, ranges[0][0], ranges[0][0] + ranges[0][1]).select(
        F.col("id").alias("off")
    )
    for off, length in ranges[1:]:
        off_df = off_df.unionAll(
            _range(spark, off, off + length).select(F.col("id").alias("off"))
        )
    edges = (
        _range(spark, vertex_count)
        .select(F.col("id").alias("src"))
        .crossJoin(F.broadcast(off_df))
        .select(
            "src",
            ((F.col("src") + F.col("off")) % vertex_count).alias("dst"),
        )
    )
    return Graph(_vertices(spark, vertex_count), edges)


def complete_graph(spark: SparkSession, vertex_count: int) -> Graph:
    """CompleteGraph.java:57: circulant with the full offset range."""
    return circulant_graph(spark, vertex_count, [(1, vertex_count - 1)])


def echo_graph(
    spark: SparkSession, vertex_count: int, vertex_degree: int
) -> Graph:
    """EchoGraph.java:76: circulant with a single range of
    ``vertex_degree`` offsets centered at n/2. Exactly one of n, d must
    be even (EchoGraph.java:67) — that parity is what makes the offset
    set symmetric mod n, hence the graph undirected."""
    if vertex_degree < 1:
        raise ValueError("vertex degree must be at least 1")
    if vertex_degree >= vertex_count:
        raise ValueError("vertex degree must be less than the vertex count")
    if not ((vertex_count % 2 == 0) ^ (vertex_degree % 2 == 0)):
        raise ValueError(
            "exactly one of vertex count and vertex degree must be even"
        )
    return circulant_graph(
        spark,
        vertex_count,
        [((vertex_count - vertex_degree + 1) // 2, vertex_degree)],
    )


def grid_graph(
    spark: SparkSession, dimensions: list[tuple[int, bool]]
) -> Graph:
    """GridGraph.java:126-161: lattice over the given (size, wrap)
    dimensions; vertex ids mix dimensions most-significant-first. Each
    dimension contributes the ±increment neighbor (or the wrapped
    complement at the endpoints). Size-2 dimensions drop wrap
    (GridGraph.java:78: both endpoints are already adjacent)."""
    if not dimensions:
        raise ValueError("no dimensions added to GridGraph")
    vertex_count = 1
    dims = []
    for size, wrap in dimensions:
        if size <= 1:
            raise ValueError("dimension size must be greater than 1")
        dims.append((size, wrap and size > 2))
        vertex_count *= size
    base = _range(spark, vertex_count).select(F.col("id").alias("src"))
    parts = []
    increment = vertex_count
    for size, wrap in dims:
        increment //= size
        index = (F.col("src") % (increment * size)) / increment
        index = F.floor(index)
        # lower neighbor (or wrap to the top of the dimension)
        parts.append(
            base.filter(index > 0).select(
                "src", (F.col("src") - increment).alias("dst")
            )
        )
        if wrap:
            parts.append(
                base.filter(index == 0).select(
                    "src",
                    (F.col("src") + increment * (size - 1)).alias("dst"),
                )
            )
        # upper neighbor (or wrap to the bottom)
        parts.append(
            base.filter(index < size - 1).select(
                "src", (F.col("src") + increment).alias("dst")
            )
        )
        if wrap:
            parts.append(
                base.filter(index == size - 1).select(
                    "src",
                    (F.col("src") - increment * (size - 1)).alias("dst"),
                )
            )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionAll(p)
    return Graph(_vertices(spark, vertex_count), edges)


def cycle_graph(spark: SparkSession, vertex_count: int) -> Graph:
    """CycleGraph.java:59: a single wrapped grid dimension."""
    return grid_graph(spark, [(vertex_count, True)])


def path_graph(spark: SparkSession, vertex_count: int) -> Graph:
    """PathGraph.java:62: a single unwrapped grid dimension."""
    return grid_graph(spark, [(vertex_count, False)])


def hypercube_graph(spark: SparkSession, dimensions: int) -> Graph:
    """HypercubeGraph.java:61-64: d size-2 grid dimensions."""
    if dimensions < 1:
        raise ValueError("number of dimensions must be at least 1")
    return grid_graph(spark, [(2, False)] * dimensions)


def star_graph(spark: SparkSession, vertex_count: int) -> Graph:
    """StarGraph.java: leaves 1..n-1 linked to center 0, both
    directions (LinkVertexToCenter emits center→leaf and leaf→center)."""
    if vertex_count < 2:
        raise ValueError("vertex count must be at least 2")
    leaves = _range(spark, 1, vertex_count).select(F.col("id").alias("leaf"))
    edges = leaves.select(
        F.lit(0).cast("long").alias("src"), F.col("leaf").alias("dst")
    ).unionAll(
        leaves.select(
            F.col("leaf").alias("src"), F.lit(0).cast("long").alias("dst")
        )
    )
    return Graph(_vertices(spark, vertex_count), edges)


def empty_graph(spark: SparkSession, vertex_count: int) -> Graph:
    """EmptyGraph.java: vertices only."""
    return Graph(_vertices(spark, vertex_count), _empty_edges(spark))


def singleton_edge_graph(
    spark: SparkSession, vertex_pair_count: int
) -> Graph:
    """SingletonEdgeGraph.java:101-106: 2k vertices; each even vertex
    pairs with its successor (both directions emitted by the symmetric
    per-vertex flatMap)."""
    if vertex_pair_count < 1:
        raise ValueError("vertex pair count must be at least 1")
    n = 2 * vertex_pair_count
    edges = _range(spark, n).select(
        F.col("id").alias("src"),
        F.when(F.col("id") % 2 == 0, F.col("id") + 1)
        .otherwise(F.col("id") - 1)
        .alias("dst"),
    )
    return Graph(_vertices(spark, n), edges)


def rmat_graph(
    spark: SparkSession,
    scale: int,
    edge_count: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> Graph:
    """RMatGraph.java (defaults A=0.57, B=C=0.19 — Graph500's
    parameters, RMatGraph.java:49-105): a directed power-law multigraph
    over 2^scale vertices. Each edge picks one quadrant per bit level:
    P[(0,0)]=a, P[(0,1)]=b, P[(1,0)]=c, P[(1,1)]=1-a-b-c. One
    ``spark.range(edge_count)`` scan with ``scale`` expression-built
    bit draws — fully parallel, no RNG state shared across splits."""
    if scale < 1 or edge_count < 1:
        raise ValueError("scale and edge count must be at least 1")
    if min(a, b, c) < 0 or a + b + c > 1:
        raise ValueError("quadrant probabilities must be a valid simplex")
    base = _range(spark, edge_count).select(F.col("id").alias("edge_id"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for bit in range(scale):
        u = _uniform_lit(seed, bit)
        src_bit = (u >= a + b).cast("long")  # quadrants c, d set the src bit
        dst_bit = ((u >= a) & (u < a + b) | (u >= a + b + c)).cast("long")
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    edges = base.select(src.alias("src"), dst.alias("dst"))
    return Graph(_vertices(spark, 2**scale), edges)


def _uniform_lit(seed: int, bit: int) -> Column:
    """Deterministic uniform in [0, 1) for (seed, edge_id, bit): the
    first 13 hex digits (52 bits — a double's full mantissa) of md5
    over the key. Same md5 idiom as the MinHash/SimHash hashing in
    queries/llm.py, so the generated graph is a pure function of its
    parameters on any cluster layout."""
    h = F.md5(
        F.concat_ws(
            "|",
            F.lit(seed).cast("string"),
            F.col("edge_id").cast("string"),
            F.lit(bit).cast("string"),
        )
    )
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / float(
        16**13
    )
