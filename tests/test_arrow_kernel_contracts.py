"""Direct contract tests for the remaining Arrow-batch kernels.

Round-3 lesson generalized (see test_way_wkb_kernel_contract.py): a
kernel that is only ever reached through layer queries can break while
the suite stays green, because Catalyst prunes unprojected UDFs out of
the plan. Every module-level pandas UDF therefore gets called here as
a plain function (``.func``) on adversarial batches — None rows, empty
batches, degenerate shapes — with no SparkSession, in seconds.

Reference parity anchors: geometry.pyx:404-620 (way/point kernels),
geometry.pyx:195-275 (relation multipolygon / multilinestring).
"""
import numpy as np
import pandas as pd

from pyrosm_spark.functions import geometry_np as G
from pyrosm_spark.operators.dedup import simhash64
from pyrosm_spark.operators.geometry import (
    point_geometry_wkb,
    segment_geometry_wkb,
)
from pyrosm_spark.operators.relations import relation_geometry_wkb
from pyrosm_spark.operators.spatial_join import (
    point_in_wkb_polygon,
    wkb_bbox,
    wkb_segment_sets,
)


def _ls(*pts):
    return G.wkb_linestring(np.asarray(pts, dtype=np.float64))


SQUARE = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
SQUARE_WKB = G.wkb_polygon([np.asarray(SQUARE, dtype=np.float64)])


# -- point / segment WKB ----------------------------------------------------

def test_point_wkb_values_and_empty_batch():
    out = point_geometry_wkb.func(pd.Series([24.9, -179.0]),
                                  pd.Series([60.2, -89.0]))
    assert list(out[0]) == list(G.wkb_point(24.9, 60.2))
    assert list(out[1]) == list(G.wkb_point(-179.0, -89.0))
    empty = point_geometry_wkb.func(pd.Series([], dtype=float),
                                    pd.Series([], dtype=float))
    assert len(empty) == 0


def test_segment_wkb_values_and_empty_batch():
    out = segment_geometry_wkb.func(
        pd.Series([1.0]), pd.Series([2.0]), pd.Series([3.0]),
        pd.Series([4.0]))
    gtype, coords = G.parse_wkb(bytes(out[0]))
    assert gtype == G.WKB_LINESTRING
    np.testing.assert_array_equal(coords, [[1.0, 2.0], [3.0, 4.0]])
    empty = segment_geometry_wkb.func(*[pd.Series([], dtype=float)] * 4)
    assert len(empty) == 0


# -- relation assembly kernel (G6) ------------------------------------------

def _rel(rows):
    members = pd.Series([r[0] for r in rows], dtype=object)
    force = pd.Series([r[1] for r in rows])
    out = relation_geometry_wkb.func(members, force)
    assert len(out) == len(rows)
    return list(out)


def test_relation_square_ring_assembles_multipolygon():
    # two open halves that line_merge into one closed square ring
    half1 = _ls((0, 0), (4, 0), (4, 4))
    half2 = _ls((4, 4), (0, 4), (0, 0))
    out = _rel([([half1, half2], False)])
    gtype, polys = G.parse_wkb(bytes(out[0]))
    assert gtype == G.WKB_MULTIPOLYGON
    assert len(polys) == 1 and len(polys[0]) == 1  # one shell, no holes


def test_relation_hole_is_even_odd_nested():
    shell = _ls(*SQUARE)
    hole = _ls((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))
    out = _rel([([shell, hole], False)])
    gtype, polys = G.parse_wkb(bytes(out[0]))
    assert gtype == G.WKB_MULTIPOLYGON
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole rings


def test_relation_unringable_members_yield_none():
    dangling = _ls((0, 0), (9, 9))  # can never close
    out = _rel([([dangling], False)])
    assert out == [None]


def test_relation_null_and_empty_members_in_mixed_batch():
    shell = _ls(*SQUARE)
    out = _rel([
        (None, False),              # NULL member array
        ([None, None], False),      # members present but all NULL
        ([], False),                # empty member array
        ([shell], False),           # valid, middle of the batch
        (None, True),               # NULL + force_linestring
    ])
    assert out[0] is None and out[1] is None and out[2] is None
    assert out[4] is None
    gtype, _ = G.parse_wkb(bytes(out[3]))
    assert gtype == G.WKB_MULTIPOLYGON


def test_relation_force_linestring_merges_route():
    a = _ls((0, 0), (1, 0))
    b = _ls((1, 0), (2, 0))
    out = _rel([([a, b], True)])
    gtype, lines = G.parse_wkb(bytes(out[0]))
    assert gtype == G.WKB_MULTILINESTRING
    assert len(lines) == 1
    np.testing.assert_array_equal(lines[0], [[0, 0], [1, 0], [2, 0]])


def test_relation_empty_batch():
    out = relation_geometry_wkb.func(pd.Series([], dtype=object),
                                     pd.Series([], dtype=bool))
    assert len(out) == 0


# -- simhash kernel ----------------------------------------------------------

def test_simhash_null_empty_whitespace_yield_none():
    out = simhash64.func(pd.Series([None, "", "   \t  ", "real text"]))
    assert out[0] is None and out[1] is None and out[2] is None
    assert out[3] is not None


def test_simhash_deterministic_and_case_insensitive():
    a = simhash64.func(pd.Series(["Hello World", "hello world"]))
    assert a[0] == a[1]
    b = simhash64.func(pd.Series(["hello world"]))
    assert b[0] == a[0]  # batch-independent


def test_simhash_empty_batch_and_all_null_batch():
    assert len(simhash64.func(pd.Series([], dtype=object))) == 0
    out = simhash64.func(pd.Series([None, None]))
    assert list(out) == [None, None]


# -- spatial-join kernels ----------------------------------------------------

def test_wkb_bbox_shapes_and_nulls():
    out = wkb_bbox.func(pd.Series(
        [None, G.wkb_point(5.0, 6.0), _ls((0, 0), (2, 3)), SQUARE_WKB],
        dtype=object))
    assert out.iloc[0]["xmin"] is None or pd.isna(out.iloc[0]["xmin"])
    assert tuple(out.iloc[1]) == (5.0, 6.0, 5.0, 6.0)
    assert tuple(out.iloc[2]) == (0.0, 0.0, 2.0, 3.0)
    assert tuple(out.iloc[3]) == (0.0, 0.0, 4.0, 4.0)
    empty = wkb_bbox.func(pd.Series([], dtype=object))
    assert len(empty) == 0


def test_point_in_wkb_polygon_refine():
    geoms = pd.Series([SQUARE_WKB, SQUARE_WKB, None,
                       G.wkb_point(0.0, 0.0)], dtype=object)
    out = point_in_wkb_polygon.func(
        pd.Series([2.0, 9.0, 2.0, 2.0]), pd.Series([2.0, 9.0, 2.0, 2.0]),
        geoms)
    # inside, outside, NULL geometry -> False, non-polygon -> False
    assert list(out) == [True, False, False, False]
    empty = point_in_wkb_polygon.func(
        pd.Series([], dtype=float), pd.Series([], dtype=float),
        pd.Series([], dtype=object))
    assert len(empty) == 0


def test_wkb_segment_sets_polygon_and_multipolygon():
    hole = np.asarray([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)],
                      dtype=np.float64)
    poly_with_hole = G.wkb_polygon(
        [np.asarray(SQUARE, dtype=np.float64), hole])
    mp = G.wkb_multipolygon([[np.asarray(SQUARE, dtype=np.float64)],
                             [hole]])
    out = wkb_segment_sets.func(pd.Series(
        [None, G.wkb_point(1.0, 1.0), poly_with_hole, mp], dtype=object))
    assert out[0] is None          # NULL in
    assert out[1] is None          # non-polygon type
    # polygon-with-hole: ONE part whose flat edge list spans both rings
    assert len(out[2]) == 1 and len(out[2][0]) == 8
    # multipolygon: one part per member polygon
    assert len(out[3]) == 2 and len(out[3][0]) == 4 and len(out[3][1]) == 4
    assert len(wkb_segment_sets.func(pd.Series([], dtype=object))) == 0


# -- similarity closure factories ---------------------------------------------

def test_pq_encode_and_lut_invariants():
    from pyrosm_spark.operators.similarity import (
        make_pq_encode_udf, make_pq_lut_udf)

    rng = np.random.RandomState(7)
    m, kc, dsub = 2, 4, 3          # dim = 6
    books = rng.uniform(-1, 1, (m, kc, dsub))
    encode = make_pq_encode_udf(books).func
    lut = make_pq_lut_udf(books).func

    vecs = [rng.uniform(-1, 1, m * dsub) for _ in range(5)]
    codes = encode(pd.Series(vecs, dtype=object))
    luts = lut(pd.Series(vecs, dtype=object))
    for v, code, table in zip(vecs, codes, luts):
        assert len(code) == m and len(table) == m * kc
        for j in range(m):
            sub = v[j * dsub:(j + 1) * dsub]
            d = ((books[j] - sub) ** 2).sum(axis=1)
            assert code[j] == int(d.argmin())          # nearest centroid
            np.testing.assert_allclose(                 # ADC dot table
                table[j * kc:(j + 1) * kc], books[j] @ sub)
        # ADC identity: sum of LUT entries at the codes == <q, decode(c)>
        adc = sum(table[j * kc + code[j]] for j in range(m))
        recon = np.concatenate([books[j][code[j]] for j in range(m)])
        np.testing.assert_allclose(adc, float(v @ recon))
    assert len(encode(pd.Series([], dtype=object))) == 0
    assert len(lut(pd.Series([], dtype=object))) == 0


def test_lsh_bucket_codes_encode_table_and_signs():
    from pyrosm_spark.operators.similarity import (
        N_PLANES, _planes, make_bucket_udf)

    dim, n_planes, n_tables = 8, 6, 3
    bucket = make_bucket_udf(dim, n_planes, n_tables).func
    rng = np.random.RandomState(11)
    vecs = [rng.uniform(-1, 1, dim) for _ in range(4)]
    out = bucket(pd.Series(vecs, dtype=object))
    weights = (1 << np.arange(n_planes))[::-1]
    for v, codes in zip(vecs, out):
        assert len(codes) == n_tables
        for t, code in enumerate(codes):
            assert code >> n_planes == t              # table id in high bits
            signs = (_planes(dim, n_planes, t) @ v) > 0
            assert (code & ((1 << n_planes) - 1)) == int((signs * weights).sum())
    assert len(bucket(pd.Series([], dtype=object))) == 0
    # determinism: same vector, fresh factory, same codes
    again = make_bucket_udf(dim, n_planes, n_tables).func(
        pd.Series([vecs[0]], dtype=object))
    assert list(again[0]) == list(out[0])


def test_ivf_assign_nprobe_and_empty_batch():
    from pyrosm_spark.operators.similarity import make_ivf_assign_udf

    rng = np.random.RandomState(3)
    cent = rng.uniform(-1, 1, (5, 4))
    assign = make_ivf_assign_udf(cent, nprobe=2).func
    vecs = [rng.uniform(-1, 1, 4) for _ in range(6)]
    out = assign(pd.Series(vecs, dtype=object))
    for v, cells in zip(vecs, out):
        d = ((cent - v) ** 2).sum(axis=1)
        np.testing.assert_array_equal(cells, np.argsort(d, kind="stable")[:2])
    assert len(assign(pd.Series([], dtype=object))) == 0


def test_phash_pair_kernels_contract():
    """Direct .func-level contracts for the phash pair-enumeration
    kernels (no Spark): popcount vs int.bit_count, first-zero-chunk vs
    a per-chunk reference (incl. the no-zero-chunk -> 3 convention),
    _emit_pairs ordering / self-pair suppression / empty batches."""
    from pyrosm_spark.operators.dedup import (
        _emit_pairs, _first_zero_chunk, _hamming64, _triangle_indices)

    rng = np.random.RandomState(7)
    x = rng.randint(-2 ** 62, 2 ** 62, size=257, dtype=np.int64)
    x[0], x[1], x[2] = 0, -1, 1 << 16
    got = _hamming64(x)
    exp = [int(v).bit_count() for v in x.astype(np.uint64).tolist()]
    np.testing.assert_array_equal(got, exp)

    fz = _first_zero_chunk(x)
    for v, f in zip(x.astype(np.uint64).tolist(), fz):
        chunks = [(int(v) >> (16 * i)) & 0xFFFF for i in range(4)]
        want = next((i for i, c in enumerate(chunks) if c == 0), 3)
        assert f == want, hex(v)

    # empty batches
    e = np.array([], dtype=np.int64)
    assert _hamming64(e).size == 0 and _first_zero_chunk(e).size == 0
    ids = np.array(["a", "b", "c", "b"], dtype=object)
    phs = np.array([0b0, 0b11, 1 << 17, 0b11], dtype=np.int64)
    empty_idx = np.array([], dtype=np.int64)
    assert _emit_pairs(ids, empty_idx, empty_idx, phs, 0, 6) is None

    # all-pairs triangle over one 4-row segment
    left, right = _triangle_indices(np.array([4]))
    # band 0 = pairs whose FIRST matching 16-bit chunk is chunk 0:
    # only (a,c) (xor = 1<<17: chunk0 zero, ham 1). (b,b) xor=0 would
    # be band 0 / ham 0 but is a self-pair -> suppressed.
    out = _emit_pairs(ids, left, right, phs, 0, 6)
    pairs = {(r.img_a, r.img_b, r.hamming) for r in out.itertuples()}
    assert pairs == {("a", "c", 1)}
    # band 1: (a,b) xor=3 (chunk0 nonzero, chunk1 zero, ham 2); the
    # duplicate-id b row collapses into the same set entry
    out1 = _emit_pairs(ids, left, right, phs, 1, 6)
    pairs1 = {(r.img_a, r.img_b, r.hamming) for r in out1.itertuples()}
    assert pairs1 == {("a", "b", 2)}
    # band 2: (b,c) xor=0x20003 — chunks 0 and 1 nonzero, chunk2 zero
    out2 = _emit_pairs(ids, left, right, phs, 2, 6)
    pairs2 = {(r.img_a, r.img_b, r.hamming) for r in out2.itertuples()}
    assert pairs2 == {("b", "c", 3)}
    # ordering: img_a < img_b always
    assert (out2.img_a < out2.img_b).all()
    # hamming cap kills the ham-3 pair
    assert _emit_pairs(ids, left, right, phs, 2, 2) is None
    # band with no first-match pairs -> nothing survives
    assert _emit_pairs(ids, left, right, phs, 3, 6) is None
