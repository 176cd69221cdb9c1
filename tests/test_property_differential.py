"""Property-based differential tests (hypothesis) against INDEPENDENT
references — pure-Python reimplementations and DuckDB's native ASOF
JOIN, not the hand-mirrored oracle SQL the driver gate uses.  A bug
copied into both the Spark plan and its oracle SQL passes the driver
compare; it cannot also pass an independently-derived answer.

Examples are small (≤ ~8 nodes / ≤ ~20 rows) so each Spark action is
sub-second; ``derandomize=True`` keeps CI deterministic."""

from __future__ import annotations

import datetime
import functools
import itertools
from collections import defaultdict

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from evmtrace_etl_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
    triangle_counts,
)
from evmtrace_etl_spark.operators.relational import asof_join
import pytest

# r15: deep scenario module — full-tier only (see tests/conftest.py)
pytestmark = pytest.mark.slow

def _utc_naive(ts: int) -> "datetime.datetime":
    """Naive UTC datetime from an epoch second (utcfromtimestamp is
    deprecated since 3.12; this is its documented replacement)."""
    return datetime.datetime.fromtimestamp(
        ts, tz=datetime.timezone.utc
    ).replace(tzinfo=None)


_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_pagerank(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Independent exact-integer PageRank mirror of the CONTRACT (not
    the code): node universe = distinct sources; same fixed-point ops."""
    out: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    nodes = sorted(out)
    n = len(nodes)
    rank = {u: SCALE // n for u in nodes}
    for _ in range(rounds):
        m: dict[int, int] = defaultdict(int)
        for s, d in edges:
            m[d] += rank[s] // out[s]
        rank = {u: (3 * SCALE) // (20 * n) + (17 * m[u]) // 20 for u in nodes}
    return rank


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=14,
    )
)
@settings(**_SETTINGS)
def test_pagerank_matches_python_reference(spark, edges):
    df = spark.createDataFrame(
        [(str(s), str(d)) for s, d in edges], "src: string, dst: string"
    )
    got = {
        int(r["node"]): r["rank"]
        for r in pagerank_fixed_point(df, rounds=3).collect()
    }
    assert got == _ref_pagerank(edges, 3)


@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=18,
    )
)
@settings(**_SETTINGS)
def test_triangles_match_bruteforce(spark, pairs):
    df = spark.createDataFrame(sorted(pairs), "a: long, b: long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[int, int] = defaultdict(int)
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for node in (x, y, z):
                want[node] += 1
    assert got == dict(want)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=12,
    ),
    right=st.dictionaries(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        st.integers(-100, 100),
        min_size=1,
        max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_duckdb_native_asof(spark, left, right):
    """DuckDB implements ASOF JOIN natively — an implementation this
    repo had no hand in.  Unique (key, t) on the right makes the
    backward-join answer unambiguous (no tiebreak needed)."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k: long, t: long, id: long"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right.items()], "k: long, t: long, v: long"
    )
    got = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            right_payload=["v"],
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, t BIGINT, id BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, t BIGINT, v BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)",
                    [(k, t, i) for i, (k, t) in enumerate(left)])
    con.executemany("INSERT INTO r VALUES (?, ?, ?)",
                    [(k, t, v) for (k, t), v in right.items()])
    want = dict(
        con.execute(
            "SELECT l.id, r.v FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    )
    con.close()
    assert got == want


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_ewma_fold_matches_python_bit_exact(spark, vals):
    """The aggregate-HOF fold performs the same IEEE multiply-add
    sequence as a Python loop (both are binary64) — results must be
    BIT-identical, which is the determinism claim the EWMA query makes."""
    df = spark.createDataFrame([(vals,)], "vals: array<double>")
    got = df.select(
        F.expr(
            "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
            " (acc, x) -> 0.25D * x + 0.75D * acc)"
        ).alias("e")
    ).collect()[0]["e"]
    want = functools.reduce(lambda acc, x: 0.25 * x + 0.75 * acc, vals[1:], vals[0])
    assert got == want


@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(**_SETTINGS)
def test_connected_components_match_union_find(spark, pairs):
    """Min-label pointer jumping vs a classic union-find: every vertex
    must land in the component labeled by its smallest reachable id."""
    from evmtrace_etl_spark.operators.dedup import connected_components

    df = spark.createDataFrame(sorted(pairs), "doc_a: long, doc_b: long")
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = defaultdict(list)
    for v in parent:
        comp[find(v)].append(v)
    want = {
        v: min(members) for members in comp.values() for v in members
    }
    assert got == want


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 400), st.integers(0, 400)),
        min_size=1,
        max_size=10,
    ),
    points=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 400)),
        min_size=1,
        max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce_containment(spark, intervals, points):
    """The bucket-decomposed range join must return exactly the pairs a
    brute-force containment scan returns — including the boundary rows
    (inclusive both ends) and intervals spanning many buckets (the
    bucket width is set far below the value range on purpose)."""
    from evmtrace_etl_spark.operators.relational import interval_join_bucketed

    iv_rows = [
        (k, i, min(s, e), max(s, e))
        for i, (k, s, e) in enumerate(intervals)
    ]
    pt_rows = [(k, i, t) for i, (k, t) in enumerate(points)]
    iv = spark.createDataFrame(
        iv_rows, "k: long, iid: long, s_us: long, e_us: long"
    ).select(
        "k", "iid",
        F.timestamp_micros(F.col("s_us") * 1_000_000).alias("s"),
        F.timestamp_micros(F.col("e_us") * 1_000_000).alias("e"),
    )
    pt = spark.createDataFrame(pt_rows, "k: long, pid: long, t_us: long").select(
        "k", "pid", F.timestamp_micros(F.col("t_us") * 1_000_000).alias("t")
    )
    got = {
        (r["iid"], r["pid"])
        for r in interval_join_bucketed(
            iv, pt, on=["k"], start="s", end="e", point_time="t",
            bucket_micros=64_000_000,  # 64 s buckets << 400 s range
        ).collect()
    }
    want = {
        (iid, pid)
        for (ik, iid, s, e) in iv_rows
        for (pk, pid, t) in pt_rows
        if ik == pk and s <= t <= e
    }
    assert got == want


def _write_events(spark, tmpdir: str, rows: list[tuple[int, int, int, str, float]]):
    """rows: (event_id, ts_seconds, user_id, event_type, value)."""
    df = spark.createDataFrame(
        rows, "event_id: long, tsec: long, user_id: long, event_type: string, value: double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("tsec") * 1_000_000).alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")


_EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(0, 5),            # ts second (small → forces ties)
        st.integers(0, 2),            # user
        st.sampled_from(["a", "b", "c"]),
        st.floats(min_value=0, max_value=9, allow_nan=False),
    ),
    min_size=1,
    max_size=14,
).map(
    lambda rows: [
        (i, t, u, e, round(v, 2)) for i, (t, u, e, v) in enumerate(rows)
    ]
)


@given(rows=_EVENT_ROWS)
@settings(**_SETTINGS)
def test_scd2_matches_python_islands(spark, rows, tmp_path_factory):
    """Gaps-and-islands SCD2 vs a direct Python pass over each user's
    (ts, event_id)-ordered stream — exercises ties (equal ts) and
    single-event islands the fixture data may never hit."""
    from evmtrace_etl_spark.plans.inventory import scd2_user_state

    d = str(tmp_path_factory.mktemp("scd2"))
    _write_events(spark, d, rows)
    got = {
        (r["user_id"], r["version"]): (
            r["state"], r["valid_from"], r["valid_to"], r["n_events"]
        )
        for r in scd2_user_state(spark, d).collect()
    }
    by_user: dict[int, list] = defaultdict(list)
    for eid, t, u, e, _ in rows:
        by_user[u].append((t, eid, e))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        islands: list[list] = []
        for t, eid, e in evs:
            if not islands or islands[-1][0] != e:
                islands.append([e, [], None])
            islands[-1][1].append(t)
        for i, (state, ts_list, _) in enumerate(islands):
            vf = _utc_naive(min(ts_list))
            nxt = (
                _utc_naive(min(islands[i + 1][1]))
                if i + 1 < len(islands)
                else None
            )
            want[(u, i + 1)] = (state, vf, nxt, len(ts_list))
    assert got == want


@given(rows=_EVENT_ROWS)
@settings(**_SETTINGS)
def test_transitions_match_python_counts(spark, rows, tmp_path_factory):
    from evmtrace_etl_spark.plans.inventory import event_transitions

    d = str(tmp_path_factory.mktemp("trans"))
    _write_events(spark, d, rows)
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
        for r in event_transitions(spark, d).collect()
    }
    by_user: dict[int, list] = defaultdict(list)
    for eid, t, u, e, _ in rows:
        by_user[u].append((t, eid, e))
    counts: dict[tuple, int] = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    totals: dict[str, int] = defaultdict(int)
    for (a, _), n in counts.items():
        totals[a] += n
    assert set(got) == set(counts)
    for k, (n, p) in got.items():
        assert n == counts[k]
        assert abs(p - counts[k] / totals[k[0]]) < 1.1e-6


@given(
    orders=st.lists(
        st.tuples(st.integers(0, 5), st.sets(st.integers(0, 5), min_size=1, max_size=4)),
        min_size=1,
        max_size=8,
        unique_by=lambda o: o[0],
    )
)
@settings(**_SETTINGS)
def test_basket_rules_match_python_bruteforce(spark, orders, tmp_path_factory):
    """Support/confidence/lift vs direct counting over order→part-set
    baskets (duplicate line items injected to confirm per-order
    de-duplication)."""
    from evmtrace_etl_spark.plans.inventory import basket_rules

    d = str(tmp_path_factory.mktemp("basket"))
    li_rows = [
        (ok, pk) for ok, parts in orders for pk in parts
    ] + [(orders[0][0], next(iter(orders[0][1])))]  # a duplicate line
    spark.createDataFrame(
        li_rows, "l_orderkey: long, l_partkey: long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    got = {
        (r["ante"], r["cons"]): (
            r["pair_orders"], r["ante_orders"], r["confidence"], r["lift"]
        )
        for r in basket_rules(spark, d).collect()
    }
    baskets = {ok: set(parts) for ok, parts in orders}
    n_orders = len(baskets)
    single: dict[int, int] = defaultdict(int)
    pair: dict[tuple, int] = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            single[p] += 1
        for a, b in itertools.combinations(sorted(parts), 2):
            pair[(a, b)] += 1
            pair[(b, a)] += 1
    want_keys = {k for k, n in pair.items() if n >= 2}
    assert set(got) == want_keys
    for (a, b), (po, ao, conf, lift) in got.items():
        assert po == pair[(a, b)] and ao == single[a]
        assert abs(conf - pair[(a, b)] / single[a]) < 1.1e-6
        exp_lift = (pair[(a, b)] / single[a]) / (single[b] / n_orders)
        assert abs(lift - exp_lift) < max(1.1e-6 * exp_lift, 1.1e-6)


@given(rows=_EVENT_ROWS)
@settings(**_SETTINGS)
def test_range_frame_7d_matches_python(spark, rows, tmp_path_factory):
    """Time-based RANGE frame vs brute force: every row's frame is ALL
    rows of the same user within the trailing window INCLUDING
    same-instant peers (tie rows generated on purpose — the property
    ROWS frames get wrong)."""
    from evmtrace_etl_spark.plans.inventory import user_value_7d

    d = str(tmp_path_factory.mktemp("r7d"))
    # shrink to a 3-second "week" equivalent by scaling: keep real op
    # (7 days) but give ts in DAYS via seconds*86400 so windows bind
    scaled = [(eid, t * 86400 * 3, u, e, v) for eid, t, u, e, v in rows]
    _write_events(spark, d, scaled)
    got = {r["event_id"]: (r["v7d"], r["n7d"]) for r in user_value_7d(spark, d).collect()}
    by_user: dict[int, list] = defaultdict(list)
    for eid, t, u, _, v in scaled:
        by_user[u].append((t, eid, v))
    for u, evs in by_user.items():
        for t, eid, _ in evs:
            frame = [vv for (tt, _, vv) in evs if t - 7 * 86400 <= tt <= t]
            want_sum = round(sum(frame), 6)
            assert got[eid][1] == len(frame)
            assert abs(got[eid][0] - want_sum) < 1.1e-6


@given(
    left=st.lists(st.tuples(st.integers(0, 1), st.integers(0, 20)), min_size=1, max_size=10),
    right=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(0, 5)),
        min_size=1, max_size=12, unique=True,
    ),
)
@settings(**_SETTINGS)
def test_asof_tiebreak_picks_greatest(spark, left, right):
    """Equal right timestamps per key (generated on purpose): the
    documented tiebreak takes the payload of the GREATEST tiebreak
    value — checked against a direct Python scan (DuckDB ASOF cannot
    express a tiebreak, so this leg needs its own reference)."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k: long, t: long, id: long"
    )
    rdf = spark.createDataFrame(right, "k: long, t: long, tie: long")
    got = {
        r["id"]: r["asof_tie"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            right_payload=["tie"], right_tiebreak="tie",
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, tie) for (rk, rt, tie) in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want


# ---------------------------------------------------------------------------
# round-6 additions: semantic dedup and IVF+PQ vs pure-Python references
# ---------------------------------------------------------------------------

import decimal as _dec
import math as _math


def _round6(x: float) -> float:
    """Spark's round(col, 6) on doubles: BigDecimal.valueOf uses the
    shortest decimal repr (== Python repr), then HALF_UP at scale 6."""
    return float(
        _dec.Decimal(repr(float(x))).quantize(
            _dec.Decimal("0.000001"), rounding=_dec.ROUND_HALF_UP
        )
    )


def _seq_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _py_assign(vecs, n_cent):
    """(cell per vector) under the engine's contract: argmax of
    round(cos, 6), ties to the smallest centroid id."""
    cents = vecs[:n_cent]
    norms = [_math.sqrt(_seq_dot(v, v)) for v in vecs]
    cells = []
    for i, v in enumerate(vecs):
        best = max(
            range(n_cent),
            key=lambda c: (
                _round6(_seq_dot(v, cents[c]) / (norms[i] * _math.sqrt(_seq_dot(cents[c], cents[c])))),
                -c,
            ),
        )
        cells.append(best)
    return cells


_IVEC4 = st.lists(st.integers(-3, 3), min_size=4, max_size=4).filter(
    lambda v: any(c != 0 for c in v)
)


@given(vecs=st.lists(_IVEC4, min_size=4, max_size=12))
@settings(**_SETTINGS)
def test_semantic_dedup_matches_python(spark, vecs):
    """semantic_dedup vs a direct Python pass: same cell assignment
    contract, same rounded pair cosine, same greedy keep-lowest rule —
    an independently-derived answer a copied plan/oracle bug cannot
    also satisfy."""
    from evmtrace_etl_spark.operators.similarity import semantic_dedup

    n_cent, tau = 2, 0.9
    fv = [[float(x) for x in v] for v in vecs]
    emb = spark.createDataFrame(
        list(enumerate(fv)), "vec_id: long, embedding: array<double>"
    )
    got = {
        r.vec_id: (r.cell, r.keep, r.dup_of)
        for r in semantic_dedup(
            emb, threshold=tau, n_centroids=n_cent
        ).collect()
    }
    cells = _py_assign(fv, n_cent)
    norms = [_math.sqrt(_seq_dot(v, v)) for v in fv]
    want = {}
    for i, v in enumerate(fv):
        dups = [
            j
            for j in range(i)
            if cells[j] == cells[i]
            and _round6(_seq_dot(fv[i], fv[j]) / (norms[i] * norms[j]))
            >= tau
        ]
        want[i] = (
            cells[i],
            0 if dups else 1,
            min(dups) if dups else -1,
        )
    assert got == want


@given(vecs=st.lists(_IVEC4, min_size=6, max_size=12))
@settings(**_SETTINGS)
def test_ivfpq_matches_python(spark, vecs):
    """ivfpq_topk vs a direct Python IVFADC: assignment, residuals,
    relationally-seeded sub-codebooks, decimal-quantized sub-distances,
    argmin codes, probed-cell LUT ADC, (adist, id) ranking."""
    from evmtrace_etl_spark.operators.similarity import ivfpq_topk

    n_cent, n_codes, n_sub, n_probe, nq, k = 2, 2, 2, 1, 2, 2
    d = 2
    fv = [[float(x) for x in v] for v in vecs]
    emb = spark.createDataFrame(
        list(enumerate(fv)), "vec_id: long, embedding: array<double>"
    )
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.adist)
        for r in ivfpq_topk(
            emb, nq, k, n_cent, n_probe, n_sub, n_codes
        ).collect()
    )

    cents = fv[:n_cent]
    cells = _py_assign(fv, n_cent)
    res = [
        [x - c for x, c in zip(v, cents[cells[i]])]
        for i, v in enumerate(fv)
    ]
    seeds = res[n_cent:n_cent + n_codes]
    sub = [
        [s[m * d:(m + 1) * d] for s in seeds] for m in range(n_sub)
    ]

    def dd(rv, m, c):
        s = 0.0
        for j in range(d):
            t = rv[m * d + j] - sub[m][c][j]
            s += t * t
        return _dec.Decimal(repr(_round6(s)))

    codes = [
        [
            min(range(n_codes), key=lambda c: (dd(res[i], m, c), c))
            for m in range(n_sub)
        ]
        for i in range(len(fv))
    ]
    norms = [_math.sqrt(_seq_dot(v, v)) for v in fv]
    want = []
    for q in range(nq):
        # probed cells: (rounded cos DESC, cen_id ASC), top n_probe
        order = sorted(
            range(n_cent),
            key=lambda c: (
                -_round6(
                    _seq_dot(fv[q], cents[c])
                    / (norms[q] * _math.sqrt(_seq_dot(cents[c], cents[c])))
                ),
                c,
            ),
        )[:n_probe]
        scored = []
        for cell in order:
            qres = [x - c for x, c in zip(fv[q], cents[cell])]
            for i in range(len(fv)):
                if i == q or cells[i] != cell:
                    continue
                adist = float(
                    sum(dd(qres, m, codes[i][m]) for m in range(n_sub))
                )
                scored.append((adist, i))
        scored.sort()
        for rank, (adist, i) in enumerate(scored[:k], start=1):
            want.append((q, rank, i, adist))
    assert got == sorted(want)


@given(
    vecs=st.lists(_IVEC4, min_size=4, max_size=10),
    labels=st.lists(st.integers(0, 2), min_size=10, max_size=10),
)
@settings(**_SETTINGS)
def test_cell_label_purity_matches_python(spark, vecs, labels):
    """cell_label_purity vs a direct Python rollup: same assignment
    contract (rounded cosine, ties to smallest centroid), majority tie
    broken toward the smallest label, purity rounded at the edge."""
    from evmtrace_etl_spark.operators.similarity import cell_label_purity

    n_cent = 2
    fv = [[float(x) for x in v] for v in vecs]
    labs = labels[: len(fv)]
    emb = spark.createDataFrame(
        [(i, v, labs[i]) for i, v in enumerate(fv)],
        "vec_id: long, embedding: array<double>, label: int",
    )
    cents = list(enumerate(fv[:n_cent]))
    got = {
        r.cell: (r.n_vecs, r.majority_label, r.majority_n, r.purity)
        for r in cell_label_purity(emb, cents).collect()
    }
    cells = _py_assign(fv, n_cent)
    want = {}
    for cell in set(cells):
        members = [labs[i] for i in range(len(fv)) if cells[i] == cell]
        counts = sorted(
            ((members.count(l), l) for l in set(members)),
            key=lambda t: (-t[0], t[1]),
        )
        n, lab = counts[0]
        want[cell] = (len(members), lab, n, _round6(n / len(members)))
    assert got == want


def test_split_leakage_rollup_matches_python(spark):
    """split_leakage's NEW logic (split hashing, train-vs-eval pair
    classification, per-split rollup) vs a Python replica of the
    salted-hash split and a Python rollup over the SAME pair list the
    LSH stage emits (pair generation itself is covered by the LSH and
    adversarial-corpus tests)."""
    import hashlib

    from evmtrace_etl_spark.operators.dedup import near_dup_pairs
    from evmtrace_etl_spark.operators.sampling import (
        SPLIT_BOUNDS,
        split_leakage,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the deep green forest before dusk settles over the hills"
    )
    docs = [(i, base + (" extra" if i % 3 == 0 else "")) for i in range(24)]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")

    def py_split(doc_id: int) -> str:
        h = int(hashlib.md5(f"split#{doc_id}".encode()).hexdigest()[:7], 16)
        b = h % 100
        for name, bound in SPLIT_BOUNDS:
            if b < bound:
                return name
        return "test"

    pairs = [
        (r.doc_a, r.doc_b, r.jaccard)
        for r in near_dup_pairs(df).collect()
    ]
    assert pairs, "fixture must produce near-dup pairs"
    want = {}
    for a, b, jac in pairs:
        sa, sb = py_split(a), py_split(b)
        if (sa == "train") == (sb == "train"):
            continue
        split, leak = (sb, b) if sa == "train" else (sa, a)
        n_pairs, docs_seen, mx = want.get(split, (0, set(), float("-inf")))
        docs_seen.add(leak)
        want[split] = (n_pairs + 1, docs_seen, max(mx, jac))
    got = {
        r.split: (r.n_leak_pairs, r.n_leaked_docs, r.max_jaccard)
        for r in split_leakage(df).collect()
    }
    assert got == {
        s: (n, len(ds), _round6(mx)) for s, (n, ds, mx) in want.items()
    }


# ---------------------------------------------------------------------------
# IVFADC (ivfpq_topk) vs an independent pure-Python IVF+PQ reference
# ---------------------------------------------------------------------------

def _d6(x: float):
    """Spark round(double, 6): shortest-repr decimal, HALF_UP."""
    from decimal import ROUND_HALF_UP, Decimal

    return Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


def _fold_norm(vec) -> float:
    import math

    s = 0.0
    for v in vec:
        s += float(v) * float(v)
    return math.sqrt(s)


def _ref_cell_order(v, cents) -> list[int]:
    """Probe order: cosine rounded 6dp DESC, then cen_id ASC — the
    reference mirror of _ivf_with_cells' reverse(array_sort(...))."""
    vn = _fold_norm(v)
    sims = []
    for cid, c in cents:
        dot = 0.0
        for x, y in zip(v, c):
            dot += float(x) * float(y)
        sims.append((float(_d6(dot / (vn * _fold_norm(c)))), -cid))
    sims.sort()
    sims.reverse()
    return [-neg for _, neg in sims]


def _ref_ivfpq_topk(
    corpus: list[list[float]],
    n_queries: int,
    k: int,
    n_centroids: int,
    n_probe: int,
    n_subspaces: int,
    n_codes: int,
) -> list[tuple]:
    """From-scratch IVFADC: coarse assign -> residual -> PQ-encode the
    residual against residual seeds -> per-(query, probed cell) LUT ->
    exact-decimal ADC -> (adist ASC, neighbor ASC) rank.  Mirrors the
    published algorithm (Jegou et al. 2011), not the Spark code."""
    cents = [(i, corpus[i]) for i in range(n_centroids)]
    d = len(corpus[0]) // n_subspaces

    def residual(v, cell):
        return [float(x) - float(y) for x, y in zip(v, cents[cell][1])]

    cell_of = {i: _ref_cell_order(v, cents)[0] for i, v in enumerate(corpus)}
    seeds = [
        residual(corpus[i], cell_of[i])
        for i in range(n_centroids, n_centroids + n_codes)
    ]
    subcents = [
        [seed[m * d : (m + 1) * d] for seed in seeds]
        for m in range(n_subspaces)
    ]

    def subdists(res, m):
        out = []
        for cent in subcents[m]:
            s = 0.0
            for x, y in zip(res[m * d : (m + 1) * d], cent):
                s += (float(x) - float(y)) * (float(x) - float(y))
            out.append(_d6(s))
        return out

    codes = {}
    for i, v in enumerate(corpus):
        res = residual(v, cell_of[i])
        codes[i] = [
            min(range(n_codes), key=lambda c: (subdists(res, m)[c], c))
            for m in range(n_subspaces)
        ]

    rows = []
    for q in range(n_queries):
        cand = []
        for pc in _ref_cell_order(corpus[q], cents)[:n_probe]:
            res = residual(corpus[q], pc)
            lut = [subdists(res, m) for m in range(n_subspaces)]
            for i in range(len(corpus)):
                if i == q or cell_of[i] != pc:
                    continue
                adist = sum(
                    (lut[m][codes[i][m]] for m in range(n_subspaces)),
                    _d6(0.0),
                )
                cand.append((adist, i))
        cand.sort()
        rows += [
            (q, nb, rank + 1, float(ad))
            for rank, (ad, nb) in enumerate(cand[:k])
        ]
    return rows


@given(
    raw=st.lists(
        st.lists(st.integers(-8, 8), min_size=4, max_size=4).filter(
            lambda v: any(v)
        ),
        min_size=8,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_ivfpq_topk_matches_python_reference(spark, raw):
    """End-to-end IVFADC differential: encode (coarse cell + residual
    PQ codes), LUT build, ADC scoring, and ranking must all agree with
    the independent reference — a bug copied into both the Spark plan
    and its mirrored oracle SQL cannot also match this."""
    from evmtrace_etl_spark.operators.similarity import ivfpq_topk

    corpus = [[i / 4 for i in v] for v in raw]
    params = dict(
        n_queries=3, k=3, n_centroids=3, n_probe=2,
        n_subspaces=2, n_codes=2,
    )
    df = spark.createDataFrame(
        list(enumerate(corpus)), "vec_id: long, embedding: array<double>"
    )
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.adist)
        for r in ivfpq_topk(df, **params).collect()
    )
    want = sorted(_ref_ivfpq_topk(corpus, **params))
    assert got == want


# ---------------------------------------------------------------------------
# weighted_sample / minhash_calibration vs pure-Python references
# ---------------------------------------------------------------------------

def _py_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_h32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_weighted_sample_matches_python_reference(spark, docs):
    """A-ES keys, the rounding-before-rank rule, and the top-k cut must
    agree with a from-scratch implementation of the published
    algorithm (Efraimidis & Spirakis 2006)."""
    import math

    from evmtrace_etl_spark.operators.sampling import (
        _WS_DENOM,
        weighted_sample,
    )

    rows = [(i, t, "s") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = [
        (r.rank, r.doc_id, r.n_toks, r.sample_key)
        for r in weighted_sample(df, k=5).orderBy("rank").collect()
    ]

    want = []
    for i, t in enumerate(docs):
        n = len(_py_tokens(t))
        if n < 1:
            continue
        u = (_py_h32(f"wsamp#{i}") + 1) / _WS_DENOM
        want.append((float(_d6(-math.log(u) / n)), i, n))
    want.sort()
    want = [
        (rank + 1, doc_id, n, key)
        for rank, (key, doc_id, n) in enumerate(want[:5])
    ]
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "fox", "dog", "sky", "sea"]),
            min_size=3,
            max_size=12,
        ).map(" ".join),
        min_size=4,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_minhash_calibration_matches_python_reference(spark, docs):
    """The whole calibration chain — shingling, permutations, banding,
    bucket-capped candidate pairs, estimate/true Jaccard, decile means
    — re-derived from the published MinHash/LSH construction."""
    from evmtrace_etl_spark.functions.text import (
        BUCKET_CAP,
        LSH_BANDS,
        LSH_ROWS,
        MERSENNE31,
        N_PERMS,
        PERMS,
        SHINGLE_K,
    )
    from evmtrace_etl_spark.operators.dedup import minhash_calibration

    rows = [(i, t, "s") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = sorted(
        (r.bin, r.n_pairs, r.avg_est, r.avg_true, r.avg_abs_err)
        for r in minhash_calibration(df).collect()
    )

    sets_, sigs = {}, {}
    for i, t in enumerate(docs):
        toks = _py_tokens(t)
        sh = {
            _py_h32(" ".join(toks[j : j + SHINGLE_K]))
            for j in range(len(toks) - SHINGLE_K + 1)
        }
        if not sh:
            continue
        sets_[i] = sh
        sigs[i] = [
            min((a * h + b) % MERSENNE31 for h in sh) for a, b in PERMS
        ]
    buckets = {}
    for i, sig in sigs.items():
        for b in range(LSH_BANDS):
            key = (
                b,
                "-".join(
                    str(sig[b * LSH_ROWS + r]) for r in range(LSH_ROWS)
                ),
            )
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for members in buckets.values():
        if len(members) > BUCKET_CAP:
            continue
        for x in members:
            for y in members:
                if x < y:
                    pairs.add((x, y))
    from collections import defaultdict
    from decimal import Decimal

    agg = defaultdict(lambda: [0, Decimal(0), Decimal(0), Decimal(0)])
    for a, b in sorted(pairs):
        matches = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        est = matches / N_PERMS
        inter = len(sets_[a] & sets_[b])
        truej = inter / (len(sets_[a]) + len(sets_[b]) - inter)
        slot = agg[min(9, int(truej * 10 // 1))]
        slot[0] += 1
        slot[1] += _d6(est)
        slot[2] += _d6(truej)
        slot[3] += _d6(abs(est - truej))
    want = sorted(
        (
            bin_,
            n,
            float(_d6(float(se) / n)),
            float(_d6(float(st_) / n)),
            float(_d6(float(sa) / n)),
        )
        for bin_, (n, se, st_, sa) in agg.items()
    )
    assert got == want


# ---------------------------------------------------------------------------
# simhash_docs / winnow_fingerprints vs pure-Python references
# ---------------------------------------------------------------------------

@given(
    docs=st.lists(
        st.text(alphabet="abc d\ne", min_size=0, max_size=40),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_simhash_matches_python_reference(spark, docs):
    """Bit-twiddling is copy-bug prone: the 32 conditional-sum bit
    aggregates must agree with a from-scratch simhash (Charikar 2002)
    over the token-hash multiset, including the >= 0 sign rule and
    multiset (not set) semantics."""
    from evmtrace_etl_spark.operators.dedup import simhash_docs

    rows = [(i, t, "s") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {r.doc_id: r.simhash for r in simhash_docs(df).collect()}

    want = {}
    for i, t in enumerate(docs):
        toks = _py_tokens(t)
        if not toks:
            continue
        bits = [0] * 32
        for tok in toks:
            h = _py_h32(tok)
            for b in range(32):
                bits[b] += 1 if (h >> b) & 1 else -1
        want[i] = sum(2 ** b for b in range(32) if bits[b] >= 0)
    assert got == want


@given(
    docs=st.lists(
        st.text(alphabet="ab c\nd", min_size=0, max_size=50),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_winnowing_matches_python_reference(spark, docs):
    """The zero-shuffle sliding-window pipeline must agree with the
    paper's construction (Schleimer et al. 2003): hash char k-grams of
    the whitespace-normalized text, keep each w-window's minimum,
    distinct + sorted."""
    import re

    from evmtrace_etl_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    k, w = 5, 4
    rows = [(i, t, "s") for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {
        r.doc_id: (r.n_fingerprints, r.fingerprints)
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }

    want = {}
    for i, t in enumerate(docs):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        if len(norm) < k + w - 1:
            continue
        hashes = [
            _py_h32(norm[j : j + k]) for j in range(len(norm) - k + 1)
        ]
        mins = sorted(
            {min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)}
        )
        want[i] = (len(mins), ",".join(str(m) for m in mins))
    assert got == want


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True))
@settings(**_SETTINGS)
def test_rendezvous_shards_match_python_reference(spark, ids):
    """HRW assignment (argmax of per-shard hashes, first index on
    ties) and the moved-set under n -> n+1 must agree with a
    from-scratch reference."""
    from evmtrace_etl_spark.operators.sampling import rendezvous_shard_col

    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    got = {
        r.doc_id: (r.sa, r.sb)
        for r in df.select(
            "doc_id",
            rendezvous_shard_col(5).alias("sa"),
            rendezvous_shard_col(6).alias("sb"),
        ).collect()
    }

    def hrw(doc_id, n):
        hs = [_py_h32(f"rdv#{doc_id}#{s}") for s in range(n)]
        return hs.index(max(hs))

    want = {i: (hrw(i, 5), hrw(i, 6)) for i in ids}
    assert got == want
    # the consistent-hashing property itself: a doc either keeps its
    # shard or moves to the NEW shard (n), never reshuffles among old
    for sa, sb in want.values():
        assert sb == sa or sb == 5


def _dec12(x: float) -> _dec.Decimal:
    """Spark's cast(double as decimal(38,12)): shortest-repr BigDecimal,
    HALF_UP at scale 12."""
    return _dec.Decimal(repr(float(x))).quantize(
        _dec.Decimal("1e-12"), rounding=_dec.ROUND_HALF_UP
    )


def _py_dsir(rows, dim, k, target_lang="en"):
    """Independent DSIR mirror of the CONTRACT: md5-bucketed unigram
    counts, add-one smoothing, decimal(38,12)-truncated per-bucket log
    ratios, decimal-exact per-doc sums, rank on the 6-dp score with a
    doc_id tie-break."""
    import hashlib
    import re as _re

    hist: dict[tuple[int, int], int] = defaultdict(int)
    rc: dict[int, int] = defaultdict(int)
    tc: dict[int, int] = defaultdict(int)
    S = T = 0
    for doc_id, text, lang in rows:
        for t in (x for x in _re.split(r"[^a-z0-9]+", text.lower()) if x):
            b = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % dim
            hist[(doc_id, b)] += 1
            rc[b] += 1
            S += 1
            if lang == target_lang:
                tc[b] += 1
                T += 1
    lr = {
        b: float(
            _dec12(
                _math.log(
                    float((tc.get(b, 0) + 1) * (S + dim))
                    / float((rc[b] + 1) * (T + dim))
                )
            )
        )
        for b in rc
    }
    per_doc: dict[int, list] = defaultdict(lambda: [0, _dec.Decimal(0)])
    for (doc_id, b), c in hist.items():
        per_doc[doc_id][0] += c
        per_doc[doc_id][1] += _dec12(float(c) * lr[b])
    scored = [
        (doc_id, n, _round6(float(s) / n)) for doc_id, (n, s) in per_doc.items()
    ]
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


_WORDS = ["the", "cat", "und", "der", "data", "ml", "x1", "zz"]


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "zh"]),
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_dsir_matches_python_reference(spark, rows):
    """dsir_weights vs a direct Python pass over the same contract —
    an independently-derived answer a copied plan/oracle bug cannot
    also satisfy.  Small dim forces bucket collisions."""
    from evmtrace_etl_spark.operators.sampling import dsir_weights

    data = [
        (i, " ".join(words), lang)
        for i, (lang, words) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "doc_id: long, text: string, lang: string")
    got = [
        (r["doc_id"], r["n_tokens"], r["avg_logratio"])
        for r in dsir_weights(df, dim=8, k=5).collect()
    ]
    assert got == _py_dsir(data, dim=8, k=5)


def _py_cms(texts, depth, width, k):
    """Independent Count-Min mirror of the CONTRACT: salted-md5 row
    hashes, min-over-rows estimate, exact top-k candidates with
    (count DESC, token ASC) ordering."""
    import hashlib
    import re as _re

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    true_cnt: dict[str, int] = defaultdict(int)
    counters: dict[tuple[int, int], int] = defaultdict(int)
    for text in texts:
        for t in (x for x in _re.split(r"[^a-z0-9]+", text.lower()) if x):
            true_cnt[t] += 1
            for d in range(depth):
                counters[(d, h(f"cms{d}#{t}") % width)] += 1
    cand = sorted(true_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return sorted(
        (
            t,
            c,
            min(counters[(d, h(f"cms{d}#{t}") % width)] for d in range(depth)),
            min(counters[(d, h(f"cms{d}#{t}") % width)] for d in range(depth))
            - c,
        )
        for t, c in cand
    )


@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_cms_matches_python_reference(spark, texts):
    """cms_heavy_hitters vs a direct Python sketch: width 4 forces
    collisions, so the one-sided error path (est > true) is exercised,
    not just the collision-free identity."""
    from evmtrace_etl_spark.operators.text_analysis import cms_heavy_hitters

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = sorted(
        (r["token"], r["true_cnt"], r["est_cnt"], r["overestimate"])
        for r in cms_heavy_hitters(df, depth=2, width=4, k=5).collect()
    )
    assert got == _py_cms(texts, depth=2, width=4, k=5)
    assert all(est >= true for _, true, est, _ in got)
