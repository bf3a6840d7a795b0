"""Round-2 operator tests: unmasked mxm SpGEMM, assign_indexed,
matrix extract variants, JP coloring, bucketed cosine near-dup,
auto-salted vecmat (reference test/gspgemm.cu + algorithm/gc.hpp
Jones-Plassmann semantics)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphblast_spark import Descriptor, Graph
from graphblast_spark.algorithms import graph_coloring_jp
from graphblast_spark.operators import (
    assign_indexed,
    extract_matrix_column,
    extract_submatrix,
    mxm,
    vxm,
)
from graphblast_spark.sources.fixtures import FIXTURES
from graphblast_spark.sources.mtx import fixture_graph

FX = FIXTURES["test_bc"]
N = FX["n"]


def dense_mat(fx):
    A = np.zeros((fx["n"], fx["n"]))
    for s, d, v in fx["edges"]:
        if s != d:
            A[s, d] = v
    return A


@pytest.fixture(scope="module")
def g(spark):
    return fixture_graph(spark, "test_bc")


def vec_df(spark, pairs, typ="double"):
    conv = float if typ == "double" else (lambda x: x)
    return spark.createDataFrame([(int(i), conv(v)) for i, v in pairs], f"id long, val {typ}")


# --- unmasked SpGEMM (test/gspgemm.cu semantics: C = A·B) ---------------
def test_mxm_unmasked_vs_numpy(spark, g):
    A = dense_mat(FX)
    C = A @ A
    got = {(r.src, r.dst): r.val for r in mxm(g, g).collect()}
    for i in range(N):
        for j in range(N):
            if C[i, j] != 0:
                assert got[(i, j)] == pytest.approx(C[i, j])
            else:
                assert (i, j) not in got


def test_mxm_minplus_semiring(spark, g):
    # MinPlus SpGEMM = 2-hop shortest path lengths through one hop
    A = dense_mat(FX)
    INF = float("inf")
    W = np.where(A != 0, A, INF)
    got = {(r.src, r.dst): r.val for r in mxm(g, g, "MinimumPlus").collect()}
    for i in range(N):
        for j in range(N):
            best = min((W[i, k] + W[k, j] for k in range(N)), default=INF)
            if best < INF:
                assert got[(i, j)] == pytest.approx(best)
            else:
                assert (i, j) not in got


# --- assign_indexed (operations.hpp:417-439) ----------------------------
def test_assign_indexed(spark):
    w = vec_df(spark, [(0, 10.0), (1, 20.0), (2, 30.0), (3, 40.0)])
    u = vec_df(spark, [(0, 1.0), (1, 2.0)])
    # indices: element u[0] goes to w[3], element u[1] goes to w[1]
    idx = vec_df(spark, [(0, 3), (1, 1)], "long")
    got = {r["id"]: r["val"] for r in assign_indexed(w, u, idx).collect()}
    assert got == {0: 10.0, 1: 2.0, 2: 30.0, 3: 1.0}


def test_assign_indexed_collision_min_source(spark):
    w = vec_df(spark, [(0, 10.0), (1, 20.0)])
    u = vec_df(spark, [(5, 7.0), (6, 9.0)])
    idx = vec_df(spark, [(5, 1), (6, 1)], "long")  # both target w[1]
    got = {r["id"]: r["val"] for r in assign_indexed(w, u, idx).collect()}
    assert got == {0: 10.0, 1: 7.0}  # smallest source id (5) wins


# --- matrix extract variants (operations.hpp:360-410 stubs) -------------
def test_extract_submatrix_and_column(spark, g):
    rows = spark.createDataFrame([(0,), (1,)], "id long")
    cols = spark.createDataFrame([(2,), (3,)], "id long")
    sub = {(r.src, r.dst) for r in extract_submatrix(g, rows, cols).collect()}
    expect = {
        (s, d) for s, d, _ in FX["edges"] if s in {0, 1} and d in {2, 3} and s != d
    }
    assert sub == expect

    col3 = {r["id"]: r["val"] for r in extract_matrix_column(g, 3).collect()}
    expect_col = {s: v for s, d, v in FX["edges"] if d == 3 and s != d}
    assert col3 == expect_col


# --- Jones-Plassmann coloring ------------------------------------------
def _proper(colors: dict, edges) -> bool:
    return all(
        colors[s] != colors[d]
        for s, d, _ in edges
        if s != d and colors[s] != 0 and colors[d] != 0
    )


def test_jp_coloring_proper_and_complete(spark, g):
    out = {r["id"]: r["color"] for r in graph_coloring_jp(g).collect()}
    assert set(out) == set(range(N))
    assert all(c >= 1 for c in out.values())  # converged: everyone colored
    assert _proper(out, FX["edges"])
    # JP never uses more colors than rounds ran; on this 7-vertex graph
    # it should be ≤ max_degree+1
    deg = {}
    for s, d, _ in FX["edges"]:
        if s != d:
            deg[s] = deg.get(s, 0) + 1
            deg[d] = deg.get(d, 0) + 1
    assert max(out.values()) <= max(deg.values()) + 1


def test_jp_fixed_rounds_partial(spark, g):
    out = {r["id"]: r["color"] for r in graph_coloring_jp(g, fixed_rounds=1).collect()}
    # after one round: winners colored 1 (no colored neighbors yet),
    # everyone else still 0; winners form an independent set
    winners = {v for v, c in out.items() if c != 0}
    assert winners and all(out[v] == 1 for v in winners)
    adj = {(s, d) for s, d, _ in FX["edges"] if s != d}
    assert not any((a, b) in adj for a in winners for b in winners)


# --- bucketed cosine near-dup ------------------------------------------
def test_cosine_neardup_bucketed_subset_of_exact(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 8)).astype("float32")
    # ids chosen so the deterministic centroids (first n_cells ids) are
    # DISTINCT base vectors — a near-dup pair where both members are
    # centroids lands in two cells by construction (the documented
    # bucketing approximation), which is not what's under test here
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # near-duplicate: tiny perturbation → cosine ≈ 1
        rows.append((100 + i, [float(x) for x in v + 0.001 * rng.normal(size=8).astype("float32")]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.a, r.b) for r in cosine_pairs(df, None).collect()}
    bucketed = {(r.a, r.b) for r in cosine_pairs(df, 4).collect()}
    # bucketed is a subset of exact, and catches the planted dup pairs
    assert bucketed <= exact
    planted = {(i, 100 + i) for i in range(6)}
    assert planted <= bucketed


def cosine_pairs(df, n_cells):
    from graphblast_spark.functions.similarity import cosine_near_dup_pairs

    return cosine_near_dup_pairs(df, threshold=0.99, n_cells=n_cells)


# --- auto-salt plan shape ----------------------------------------------
def test_vecmat_forced_salt_two_phase_plan(spark, g):
    u = vec_df(spark, [(i, float(i + 1)) for i in range(N)])
    out = vxm(u, g, "PlusMultiplies", u_nvals=N, salt=4)
    plan = out._jdf.queryExecution().analyzed().toString()
    # two-phase reduce: the salt lane column appears in the plan
    assert "_salt" in plan
    # and the values still match the unsalted path
    ref = {r["id"]: r["val"] for r in vxm(u, g, u_nvals=N, salt=None).collect()}
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == pytest.approx(ref)


def test_vecmat_auto_salt_triggers_on_budget(spark, g):
    u = vec_df(spark, [(i, float(i + 1)) for i in range(N)])
    # tiny budget: every hub exceeds it → the auto path must salt
    desc = Descriptor(salt_budget=1)
    out = vxm(u, g, "PlusMultiplies", u_nvals=N, desc=desc, salt="auto")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan
    ref = {r["id"]: r["val"] for r in vxm(u, g, u_nvals=N, salt=None).collect()}
    assert {r["id"]: r["val"] for r in out.collect()} == pytest.approx(ref)
    # default budget on a tiny graph: no salting (single-phase reduce)
    out2 = vxm(u, g, "PlusMultiplies", u_nvals=N, salt="auto")
    plan2 = out2._jdf.queryExecution().analyzed().toString()
    assert "_salt" not in plan2


def test_mis_coloring_proper_and_complete(spark, g):
    from graphblast_spark.algorithms import graph_coloring_mis

    out = {r["id"]: r["color"] for r in graph_coloring_mis(g).collect()}
    assert set(out) == set(range(N))
    assert all(c >= 1 for c in out.values())
    assert _proper(out, FX["edges"])
    # each color class is an independent set AND maximal in its residual
    adj = {(s, d) for s, d, _ in FX["edges"] if s != d}
    adj |= {(d, s) for s, d in adj}
    for k in set(out.values()):
        cls = {v for v, c in out.items() if c == k}
        assert not any((a, b) in adj for a in cls for b in cls if a != b)
        # maximality: every vertex with a LARGER color has a neighbor in
        # this class (else it would have joined this MIS)
        for v, c in out.items():
            if c > k:
                assert any((v, u) in adj for u in cls)


# --- convergence-witness overflow & 64-bit-id weight ties ---------------
def test_decimal_label_sum_does_not_wrap(spark):
    # two labels of 2^62 overflow an int64 sum: ANSI Spark (4.x default)
    # kills the whole job mid-superstep, non-ANSI silently wraps (and a
    # wrapped collision could fake convergence). The decimal(38,0)
    # witness used by cc/lp is exact and safe under either mode.
    big = 1 << 62
    df = spark.createDataFrame([(0, big), (1, big)], "id long, val long")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.agg(F.sum("val")).first()
    exact = int(df.agg(F.sum(F.col("val").cast("decimal(38,0)"))).first()[0])
    assert exact == 2 * big


def test_mis_terminates_on_lcg_weight_tie(spark):
    from graphblast_spark.algorithms import mis
    from graphblast_spark.algorithms.mis import _MERSENNE31

    # ids differing by the Mersenne modulus collide in lcg_weight; under
    # the old strict w > m rule neither adjacent vertex could ever win
    a, b = 5, 5 + _MERSENNE31
    edges = spark.createDataFrame([(a, b, 1.0)], "src long, dst long, val double")
    g = Graph.build(edges, symmetrize=True)
    out = {r["id"]: r["in_mis"] for r in mis(g).collect()}
    # the (weight, id) tiebreak admits exactly one of the tied pair
    assert sorted(out) == [a, b]
    assert out[a] + out[b] == 1


# --- k-means IVF quantizer ---------------------------------------------
def test_kmeans_centroids_and_ivf_recall(spark):
    from graphblast_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(11)
    # three well-separated clusters of 20 vectors each
    means = np.eye(3, 8) * 10.0
    rows = []
    for c in range(3):
        for j in range(20):
            v = (means[c] + 0.1 * rng.normal(size=8)).astype("float32")
            rows.append((c * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(df, k=3, iters=4)
    got = {r["cell"]: np.array(r["centroid"]) for r in cents.collect()}
    assert len(got) == 3
    # each learned centroid aligns with one true cluster mean (cos > .99)
    for c in got.values():
        best = max(
            float(m @ c / (np.linalg.norm(m) * np.linalg.norm(c)))
            for m in means
        )
        assert best > 0.99
    # IVF with k-means cells reproduces exact top-3 for every query
    qs = df.orderBy("vec_id").limit(6)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(df, qs, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(df, qs, k=3, nprobe=1, centroids=cents).collect()
    }
    assert approx == exact


# --- matrix eWiseAdd (NOT_IMPLEMENTED stub in reference) ----------------
def test_ewise_add_matrix_union_semantics(spark, g):
    from graphblast_spark.operators import ewise_add_matrix

    A = dense_mat(FX)
    b = g.edges.filter(F.col("src") > F.col("dst")).withColumn("val", F.lit(10.0))
    got = {(r.src, r.dst): r.val for r in ewise_add_matrix(g, b).collect()}
    for s, d, v in FX["edges"]:
        if s == d:
            continue
        expect = A[s, d] + (10.0 if s > d else 0.0)
        assert got[(s, d)] == pytest.approx(expect)


def test_byte_histogram_exact(spark):
    from graphblast_spark.functions.multimodal import byte_histogram

    rows = [(1, b"abc"), (2, b""), (3, bytes(range(32)))]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: list(r["hist"]) for r in byte_histogram(assets).collect()}
    h1 = [0] * 16
    for c in b"abc":
        h1[c % 16] += 1
    assert got[1] == h1
    assert got[2] == [0] * 16
    assert got[3] == [2] * 16  # 0..31 covers each residue exactly twice


def test_build_equivalent_to_clean_edges(spark):
    """Graph.build's fused repartition-then-dedup must produce exactly
    clean_edges' reference semantics (util.hpp:263-329) for every flag
    combination."""
    from graphblast_spark.matrix import clean_edges

    raw = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (1, 0, 1.0), (2, 2, 1.0), (2, 3, 1.0), (2, 3, 1.0)],
        "src long, dst long, val double",
    )
    for sym in (False, True):
        ref = {
            (r.src, r.dst)
            for r in clean_edges(raw, symmetrize=sym).collect()
        }
        got = {
            (r.src, r.dst)
            for r in Graph.build(raw, symmetrize=sym).edges.collect()
        }
        assert got == ref, f"symmetrize={sym}"


# --- per-partition Arrow SpMV kernel (operators/kernel.py) -------------

def test_arrow_kernel_agrees_with_join_vecmat(spark):
    """The mapInArrow dense-pull kernel must be value-identical to the
    join+agg vecmat on a dense vector, for both supported semirings and
    both orientations (reference spmv.hpp kernel vs the join plan)."""
    from graphblast_spark.operators import mxv, mxv_arrow, vxm_arrow

    g = fixture_graph(spark, "chesapeake")
    u = g.vertices.select("id", ((F.col("id") % 7) + 1).cast("double").alias("val"))
    for sr in ("PlusMultiplies", "MinimumPlus"):
        a = {r.id: r.val for r in vxm(u, g, sr, u_nvals=g.n).collect()}
        b = {r.id: r.val for r in vxm_arrow(u, g, sr).collect()}
        assert set(a) == set(b)
        assert all(abs(a[i] - b[i]) < 1e-9 for i in a), sr
    a = {r.id: r.val for r in mxv(u, g, "PlusMultiplies", u_nvals=g.n).collect()}
    b = {r.id: r.val for r in mxv_arrow(u, g, "PlusMultiplies").collect()}
    assert set(a) == set(b)
    assert all(abs(a[i] - b[i]) < 1e-9 for i in a)
    with pytest.raises(ValueError):
        vxm_arrow(u, g, "LogicalOrAnd")  # outside the dense-regime set
    g.unpersist()


def test_kmeans_sampled_init_deterministic_and_auto_full_below_cap(spark):
    """init_sample='auto' must equal init_sample=None below the cap
    (the sandbox-fixture regime), and a forced small sample must stay
    deterministic (hash filter, not RNG) while still fitting k cells
    because Lloyd refines over the FULL corpus."""
    from graphblast_spark.functions.similarity import kmeans_centroids

    rng = np.random.default_rng(7)
    means = np.eye(3, 8) * 10.0
    rows = []
    for c in range(3):
        for j in range(40):
            v = (means[c] + 0.1 * rng.normal(size=8)).astype("float32")
            rows.append((c * 1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    full = {r["cell"]: tuple(r["centroid"])
            for r in kmeans_centroids(df, k=3, iters=3, init_sample=None).collect()}
    auto = {r["cell"]: tuple(r["centroid"])
            for r in kmeans_centroids(df, k=3, iters=3, init_sample="auto").collect()}
    assert auto == full  # 120 rows < 4096 cap → sample IS the corpus

    s1 = {r["cell"]: tuple(r["centroid"])
          for r in kmeans_centroids(df, k=3, iters=3, init_sample=30).collect()}
    s2 = {r["cell"]: tuple(r["centroid"])
          for r in kmeans_centroids(df, k=3, iters=3, init_sample=30).collect()}
    assert s1 == s2 and len(s1) == 3
    # sampled init still lands every centroid on a true cluster
    for cvec in s1.values():
        c = np.array(cvec)
        best = max(float(m @ c / (np.linalg.norm(m) * np.linalg.norm(c)))
                   for m in means)
        assert best > 0.99

    with pytest.raises(ValueError, match="init_sample"):
        kmeans_centroids(df, k=3, init_sample="Auto")


def test_ivf_default_kmeans_recall_beats_firstn(spark):
    """Default quantizer is kmeans; on an id-clustered corpus (first n
    ids all in one cluster — the adversarial case for first-n cells)
    its recall vs brute force must be at least the first-n path's."""
    from graphblast_spark.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(7)
    means = np.eye(4, 8) * 10.0
    rows = []
    for c in range(4):
        for j in range(20):
            v = (means[c] + 0.1 * rng.normal(size=8)).astype("float32")
            rows.append((c * 100 + j, [float(x) for x in v]))  # ids blocked by cluster
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.orderBy("vec_id").limit(12)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(df, qs, k=3).collect()}

    def recall(quantizer):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(df, qs, k=3, n_cells=4, nprobe=1, quantizer=quantizer).collect()
        }
        return len(got & exact) / len(exact)

    r_kmeans, r_firstn = recall("kmeans"), recall("firstn")
    assert r_kmeans >= r_firstn
    assert r_kmeans > 0.95  # well-separated clusters: kmeans cells ≈ exact
