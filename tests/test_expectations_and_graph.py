"""Tests for the write-path expectations operator and bounded-iteration
PageRank (``operators/expectations.py``, ``operators/graph.py``)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.operators.expectations import Rule, validate
from yc_yq_airflow_etl_spark.operators.graph import pagerank


def _rules():
    return [
        Rule("v_pos", F.col("v") > 0),
        Rule("name_set", F.col("name").isin("a", "b")),
    ]


def test_validate_splits_exactly(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", -1), (3, "c", 5), (4, "a", None)],
        "id bigint, name string, v int",
    )
    clean, quarantine, stats = validate(df, _rules())
    assert sorted(r.id for r in clean.collect()) == [1]
    q = {r.id: r for r in quarantine.collect()}
    assert sorted(q) == [2, 3, 4]
    # per-row diagnosis labels, in rule-list order
    assert q[2]._failed_rules == ["v_pos"]
    assert q[3]._failed_rules == ["name_set"]
    # NULL in a checked column fails the rule (three-valued logic is
    # collapsed to fail-closed)
    assert q[4]._failed_rules == ["v_pos"]
    # original schema preserved on clean
    assert clean.columns == ["id", "name", "v"]


def test_validate_null_fails_closed(spark):
    df = spark.createDataFrame([(1, None)], "id bigint, v int")
    clean, quarantine, _ = validate(df, [Rule("v_pos", F.col("v") > 0)])
    assert clean.count() == 0
    assert quarantine.count() == 1


def test_validate_stats_rows(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", -1), (3, "c", 5)],
        "id bigint, name string, v int",
    )
    _, _, stats = validate(df, _rules())
    s = {r.rule: (r.n_checked, r.n_violations) for r in stats.collect()}
    assert s["v_pos"] == (3, 1)
    assert s["name_set"] == (3, 1)
    assert s["_total"] == (3, 2)  # id=2 and id=3 each fail one rule


def test_audit_matches_validate_stats_plus_combos(spark):
    from yc_yq_airflow_etl_spark.operators.expectations import audit

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", -1), (3, "c", 5), (4, "c", -2)],
        "id bigint, name string, v int",
    )
    _, _, stats = validate(df, _rules())
    a = {r.rule: (r.n_checked, r.n_violations) for r in audit(df, _rules()).collect()}
    for r in stats.collect():
        assert a[r.rule] == (r.n_checked, r.n_violations)
    # combos: id=2 fails v_pos only; id=3 fails name_set only;
    # id=4 fails both, labels in rule-list order
    assert a["combo:v_pos"] == (1, 1)
    assert a["combo:name_set"] == (1, 1)
    assert a["combo:v_pos+name_set"] == (1, 1)
    # one-scan plan: exactly one scan of the source relation
    plan = audit(df, _rules())._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") <= 1


def test_audit_checksum_matches_quarantine(spark):
    """audit(checksum_col=) must agree with an independent derivation
    from validate()'s quarantine: per rule, the key sum of rows whose
    diagnosis contains that rule; '_total' = all quarantined keys;
    combo rows = their member keys; an all-pass rule reports 0 (not
    NULL); the legacy no-checksum call keeps its exact 3-col schema."""
    from yc_yq_airflow_etl_spark.operators.expectations import audit

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", -1), (3, "c", 5), (4, "c", -2), (8, "a", 7)],
        "id bigint, name string, v int",
    )
    rules = _rules() + [Rule("id_small", F.col("id") < 100)]  # never fails
    out = {
        r.rule: (r.n_violations, r.violation_key_sum)
        for r in audit(df, rules, checksum_col="id").collect()
    }
    _, quarantine, _ = validate(df, rules)
    expect: dict[str, int] = {}
    total = 0
    for row in quarantine.collect():
        total += row.id
        for rule in row._failed_rules:
            expect[rule] = expect.get(rule, 0) + row.id
    assert out["_total"][1] == total
    for rule in ("v_pos", "name_set"):
        assert out[rule][1] == expect[rule], rule
    assert out["id_small"] == (0, 0)  # all-pass rule: zero, not NULL
    assert out["combo:v_pos"][1] == 2
    assert out["combo:name_set"][1] == 3
    assert out["combo:v_pos+name_set"][1] == 4
    # back-compat: without checksum_col the column must not appear
    assert audit(df, rules).columns == ["rule", "n_checked", "n_violations"]


def test_validate_rejects_bad_rulesets(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [Rule("x", F.lit(True)), Rule("x", F.lit(False))])
    # the report label namespace is reserved: '_total', 'combo:*',
    # and '+' inside a name would collide with summary/combo rows
    for bad in ("_total", "combo:x", "a+b"):
        with pytest.raises(ValueError):
            validate(df, [Rule(bad, F.lit(True))])
    # scratch-column collisions with the input schema
    df2 = spark.createDataFrame([(1, True)], "id bigint, _ok_x boolean")
    with pytest.raises(ValueError):
        validate(df2, [Rule("x", F.lit(True))])


def _ranks(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    return {r.id: r.rank for r in pagerank(df, **kw).collect()}


def test_pagerank_symmetric_pair(spark):
    # two vertices, one edge: perfectly symmetric → 0.5 each at every
    # iteration count
    r = _ranks(spark, [(1, 2)], iterations=4)
    assert r[1] == pytest.approx(0.5)
    assert r[2] == pytest.approx(0.5)


def test_pagerank_mass_conserved_and_hub_ranks_highest(spark):
    # star: 0 connected to 1..4 — the hub must dominate, total mass ~1
    pairs = [(0, i) for i in range(1, 5)]
    r = _ranks(spark, pairs, iterations=5)
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-9)
    assert r[0] > max(r[i] for i in range(1, 5))
    # leaves are symmetric
    leaf = {round(r[i], 12) for i in range(1, 5)}
    assert len(leaf) == 1


def test_pagerank_matches_closed_form_on_star(spark):
    # closed form for the 5-vertex star at the fixed point — with
    # symmetrized edges the hub receives all 4 leaves' full rank, each
    # leaf receives hub/4: solving h = t + d*4*l, l = t + d*h/4 with
    # t=(1-d)/5 gives h = t(1+4d)/(1-d^2). 5 iterations converge to
    # ~1e-4 of the fixed point; assert against the iterate instead by
    # replaying the recurrence in plain Python.
    d, n = 0.85, 5
    t = (1.0 - d) / n
    h = l = 1.0 / n
    for _ in range(3):
        h, l = t + d * 4 * (l / 1), t + d * (h / 4)
    r = _ranks(spark, [(0, i) for i in range(1, 5)], iterations=3)
    assert r[0] == pytest.approx(h, rel=1e-12)
    assert r[1] == pytest.approx(l, rel=1e-12)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert pagerank(df).count() == 0


def test_pagerank_requires_positive_iterations(spark):
    df = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_gap_fill_invariants(spark):
    """Structural invariants of timeseries_gap_fill on the fixture:
    spine covers [first, last] active day per key, the first spine day
    is active (so forward-fill is total), and carried revenue can
    never fall below actual."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["timeseries_gap_fill"](
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    assert rows, "fixture produced no purchase series"
    for r in rows:
        assert r.n_days == r.n_active + r.n_filled
        assert r.n_active >= 1
        assert r.carried_revenue >= r.actual_revenue - 1e-9


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.sampled_from(["a", "b", "c", None]),
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=_rows)
def test_expectations_match_python_reference(spark, rows):
    """Property: validate()'s split and audit()'s full report agree
    with a plain-Python evaluation of the same rules over arbitrary
    rows (NULLs included — fail-closed on both paths)."""
    from yc_yq_airflow_etl_spark.operators.expectations import audit

    df = spark.createDataFrame(rows, "id int, v int, name string")
    rules = [
        Rule("v_pos", F.col("v") > 0),
        Rule("name_ab", F.col("name").isin("a", "b")),
    ]

    def ok(r):
        return (
            r[1] is not None and r[1] > 0,
            r[2] is not None and r[2] in ("a", "b"),
        )

    exp_clean = sorted(r[0] for r in rows if all(ok(r)))
    exp_quar = sorted(r[0] for r in rows if not all(ok(r)))

    clean, quarantine, stats = validate(df, rules)
    assert sorted(r.id for r in clean.collect()) == exp_clean
    assert sorted(r.id for r in quarantine.collect()) == exp_quar

    s = {r.rule: (r.n_checked, r.n_violations) for r in stats.collect()}
    n = len(rows)
    assert s["v_pos"] == (n, sum(1 for r in rows if not ok(r)[0]))
    assert s["name_ab"] == (n, sum(1 for r in rows if not ok(r)[1]))
    assert s["_total"] == (n, len(exp_quar))

    a = {r.rule: (r.n_checked, r.n_violations) for r in audit(df, rules).collect()}
    for k, v in s.items():
        assert a[k] == v
    # combo rows partition the quarantine exactly
    combo_total = sum(v[0] for k, v in a.items() if k.startswith("combo:"))
    assert combo_total == len(exp_quar)


_series = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),   # user
        st.integers(min_value=0, max_value=40),  # day offset
        st.integers(min_value=1, max_value=9999),  # cents
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(series=_series)
def test_gap_fill_matches_python_reference(spark, series):
    """Property: the gap-fill core agrees with a plain-Python LOCF
    replay over arbitrary sparse multi-event daily series."""
    from datetime import datetime, timedelta

    from yc_yq_airflow_etl_spark.plans.analytics import gap_fill_daily_report

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (u, base + timedelta(days=d), cents / 100.0)
        for u, d, cents in series
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r.user_id: (
            r.n_days,
            r.n_active,
            r.n_filled,
            round(r.actual_revenue, 2),
            round(r.carried_revenue, 2),
        )
        for r in gap_fill_daily_report(df).collect()
    }

    # python reference
    from collections import defaultdict

    daily = defaultdict(lambda: defaultdict(int))
    for u, d, cents in series:
        daily[u][d] += cents
    exp = {}
    for u, dd in daily.items():
        d0, d1 = min(dd), max(dd)
        carried = 0
        last = None
        for d in range(d0, d1 + 1):
            if d in dd:
                last = dd[d]
            carried += last
        actual = sum(dd.values())
        exp[u] = (
            d1 - d0 + 1,
            len(dd),
            (d1 - d0 + 1) - len(dd),
            round(actual / 100.0, 2),
            round(carried / 100.0, 2),
        )
    assert got == exp, (series, got, exp)


_graphs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(pairs=_graphs)
def test_pagerank_matches_python_reference(spark, pairs):
    """Property: 3-iteration PageRank over random small undirected
    graphs agrees with a plain-Python replay of the identical
    recurrence to float tolerance."""
    r = _ranks(spark, pairs, iterations=3)

    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    out = {}
    for s_, d_ in edges:
        out.setdefault(s_, set()).add(d_)
    n = len(out)
    t = (1.0 - 0.85) / n
    ranks = {v: 1.0 / n for v in out}
    for _ in range(3):
        incoming = {v: 0.0 for v in out}
        for s_, ds in out.items():
            share = ranks[s_] / len(ds)
            for d_ in ds:
                incoming[d_] += share
        ranks = {v: t + 0.85 * m for v, m in incoming.items()}
    assert set(r) == set(ranks)
    for v in ranks:
        assert r[v] == pytest.approx(ranks[v], rel=1e-9), (pairs, v)


_inact = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user
        st.integers(min_value=0, max_value=2000),   # epoch offset (s)
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(events=_inact, gap=st.integers(min_value=50, max_value=400),
       delay=st.integers(min_value=10, max_value=100))
def test_inactivity_closures_match_python_reference(spark, events, gap, delay):
    """Property: the batch closure replay agrees with a plain-Python
    sessionized replay of the fine-grained-watermark timer semantics
    for arbitrary event sets, gaps and delays (strict boundaries
    included)."""
    from yc_yq_airflow_etl_spark.plans.streaming_queries import (
        inactivity_closures,
    )

    df = spark.createDataFrame(events, "user_id long, ep long")
    got = sorted(
        (r.user_id, r.n_events, r.last_ts_epoch)
        for r in inactivity_closures(df, gap_s=gap, delay_s=delay).collect()
    )

    wm = max(e for _, e in events) - delay
    per_user = {}
    for u, e in sorted(events, key=lambda x: (x[0], x[1])):
        per_user.setdefault(u, []).append(e)
    exp = []
    for u, eps in per_user.items():
        sessions = [[eps[0]]]
        for prev, cur in zip(eps, eps[1:]):
            if cur - prev > gap + delay:
                sessions.append([cur])
            else:
                sessions[-1].append(cur)
        for i, sess in enumerate(sessions):
            is_last = i == len(sessions) - 1
            if not is_last or sess[-1] + gap < wm:
                exp.append((u, len(sess), sess[-1]))
    assert got == sorted(exp), (events, gap, delay, got, exp)


_clicks_purchases = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # user
        st.integers(min_value=0, max_value=7200),    # seconds offset
        st.booleans(),                               # is_purchase
        st.integers(min_value=1, max_value=9999),    # cents
    ),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(rows=_clicks_purchases)
def test_attribution_matches_python_reference(spark, rows):
    """Property: linear multi-touch attribution agrees with a
    plain-Python credit-splitting replay over arbitrary click/purchase
    interleavings (including purchases with no touches, shared-window
    clicks, and inclusive/exclusive boundary events)."""
    from datetime import datetime, timedelta

    from yc_yq_airflow_etl_spark.plans.analytics import (
        linear_attribution_report,
    )

    base = datetime(2024, 3, 1, 0, 0, 0)
    ev = [
        (
            i,
            base + timedelta(seconds=off),
            u,
            "purchase" if isp else "click",
            cents / 100.0,
        )
        for i, (u, off, isp, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        r.user_id: (r.n_purchases, r.n_touches, r.attributed_revenue)
        for r in linear_attribution_report(df).collect()
    }

    clicks = [(u, off) for (u, off, isp, _) in rows if not isp]
    exp: dict[int, list] = {}
    for pid, (u, off, isp, cents) in enumerate(rows):
        if not isp:
            continue
        touches = [1 for (cu, coff) in clicks if cu == u and off >= coff and off < coff + 1800]
        if not touches:
            continue
        n = len(touches)
        pr, to, rev = exp.get(u, (0, 0, 0.0))
        exp[u] = (pr + 1, to + n, rev + sum(cents / n for _ in range(n)))
    expected = {
        u: (pr, to, round(rev / 100.0, 2)) for u, (pr, to, rev) in exp.items()
    }
    assert got == expected, (rows, got, expected)


def test_pagerank_empty_graph_keeps_input_id_type(spark):
    """An empty input must return an empty frame whose id column has
    the INPUT pair columns' type (string ids in -> string ids out), so
    a caller's union/join against non-empty results cannot break."""
    for typ in ("string", "bigint"):
        empty = spark.createDataFrame([], f"id_a {typ}, id_b {typ}")
        out = pagerank(empty)
        assert out.count() == 0
        assert out.schema["id"].dataType.simpleString() == typ
        assert out.schema["rank"].dataType.simpleString() == "double"


def test_normalize_entity_key_strips_tokens_not_prefixes(spark):
    """Article/suffix stripping is token-delimited: names merely
    starting with 'the' or ending in 'inc'/'llc' letters keep them
    ('Theodore' != 'odore', 'Zinc' != 'z'); real article/suffix
    tokens and separators still collapse variants onto one key."""
    from pyspark.sql import functions as SF

    from yc_yq_airflow_etl_spark.functions.text import normalize_entity_key

    rows = spark.createDataFrame(
        [
            ("Theodore",),
            ("Zinc",),
            ("The Acme Co",),
            ("ACME-CO LLC",),
            ("acme co, inc.",),
            ("Blinc",),  # ends in 'inc' letters but not as a token
        ],
        "name string",
    )
    got = {
        r.name: r.k
        for r in rows.select(
            "name", normalize_entity_key(SF.col("name")).alias("k")
        ).collect()
    }
    assert got["Theodore"] == "theodore"
    assert got["Zinc"] == "zinc"
    assert got["Blinc"] == "blinc"
    assert got["The Acme Co"] == got["ACME-CO LLC"] == got["acme co, inc."] == "acmeco"


def test_pagerank_degenerate_edges_null_selfloop_duplicate(spark):
    """r15 degenerate-input sweep: NULL-id pairs are NON-EDGES (a NULL
    never equi-matches, so a (NULL, b) edge receives rank mass the
    src-side join can never pay back — ranks stop summing to 1 and a
    ghost NULL vertex appears); self-loops and duplicate pairs are
    legal and must not break mass conservation. Mutation-verified: on
    the unfiltered code the NULL case emits an id=NULL row and the
    rank sum drops below 1."""
    pairs = spark.createDataFrame(
        [
            (1, 2),
            (1, 2),        # duplicate pair
            (2, 2),        # self-loop
            (None, 3),     # NULL endpoint: non-edge
            (3, None),
            (None, None),
        ],
        "id_a long, id_b long",
    )
    got = pagerank(pairs, iterations=4).collect()
    ids = {r.id for r in got}
    assert ids == {1, 2}  # vertex 3 only had NULL-edges: isolated
    assert None not in ids
    assert math.isclose(sum(r.rank for r in got), 1.0, rel_tol=1e-9)
    with pytest.raises(ValueError, match="damping"):
        pagerank(pairs, damping=1.5)


def test_connected_components_degenerate_edges(spark):
    """r15 sweep twin for connected_components: NULL labels escape the
    DECIMAL label sum (sum ignores NULL), so a NULL vertex breaks the
    monotone-decrease convergence check; NULL-id pairs must be
    non-edges. Self-loops and duplicates are harmless. Mutation-
    verified: unfiltered, the output carries an id=NULL row."""
    from yc_yq_airflow_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2),
            (2, 3),
            (2, 3),       # duplicate
            (4, 4),       # self-loop: own component
            (None, 5),    # non-edges
            (5, None),
        ],
        "id_a long, id_b long",
    )
    got = {r.id: r.label for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}
