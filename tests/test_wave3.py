"""Round-4 wave-3 operators: pii_scrub, json_field_agg, mode_per_key,
semi_join (broadcast and hash paths), left-outer zero-fill — each vs a
brute-force or adversarial reference."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array(rows, pa.string())})).repartition(3)


def test_pii_scrub_adversarial(ray_session):
    from ics_search_engine_ray.stages.pii import pii_scrub
    texts = [
        "mail a.b-c_d%e+f@sub.domain.org now",          # every email char
        "ip 10.0.0.1 then 255.255.255.255, ok",          # two IPs
        "call 415-555-0142 or 415.555.0142 or 415 555 0142",  # all seps
        "card 4111111111111111 and 4111-1111-1111-1111",
        "not pii: v1.2 x@y (no tld dot) 12-34-56 1234",
        "email-eats-digits e9@f.io 1.2.3.4",
        "",
    ]
    out = {r["doc_id"]: r for b in pii_scrub(_docs(texts)).iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()}
    assert out[0]["clean_text"] == "mail <EMAIL> now"
    assert out[0]["n_email"] == 1
    assert out[1]["clean_text"] == "ip <IP> then <IP>, ok"
    assert out[1]["n_ip"] == 2
    assert out[2]["n_phone"] == 3
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE> or <PHONE>"
    assert out[3]["n_card"] == 2
    assert out[3]["clean_text"] == "card <CARD> and <CARD>"
    # the non-PII line survives untouched ("12-34-56 1234" matches nothing)
    assert out[4]["clean_text"] == texts[4]
    assert sum(out[4][k] for k in
               ("n_email", "n_ip", "n_phone", "n_card")) == 0
    assert out[5]["clean_text"] == "email-eats-digits <EMAIL> <IP>"
    assert out[6]["clean_text"] == ""


def test_pii_sql_exprs_match_kernel(ray_session):
    """The DuckDB replica replays the exact kernel (RE2 == RE2)."""
    import duckdb
    from ics_search_engine_ray.stages.pii import pii_scrub, pii_sql_exprs
    texts = ["x bob@a.io 1.2.3.4 415-555-0142 4111 1111 1111 1111 y",
             "nested 12.34.56.78@q.com trailing 999-999-9999x"]
    mine = pii_scrub(_docs(texts)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    scrub, counts = pii_sql_exprs("text")
    cnt = ", ".join(f"CAST({e} AS BIGINT) AS n_{k}"
                    for k, e in counts.items())
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    want = con.execute(
        f"SELECT doc_id, {scrub} AS clean_text, {cnt} "
        f"FROM documents ORDER BY doc_id").df()
    assert list(mine["clean_text"]) == list(want["clean_text"])
    for k in ("n_email", "n_ip", "n_phone", "n_card"):
        assert list(mine[k]) == list(want[k])


def test_json_field_agg(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import json_field_agg
    props = ['{"k": 3}', '{"k": -2}', '{"j": 9}', 'garbage', '{"k": 10}',
             '{"k":7}', None]
    types = ["a", "a", "a", "b", "b", "b", "b"]
    ev = rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "props": pa.array(props, pa.string())})).repartition(3)
    got = {r["event_type"]: r for b in json_field_agg(ev).iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()}
    assert got["a"] == {"event_type": "a", "n": 2, "sum_k": 1,
                        "avg_k": 0.5}
    assert got["b"] == {"event_type": "b", "n": 2, "sum_k": 17,
                        "avg_k": 8.5}


def test_mode_per_key_ties_and_layout(ray_session):
    import ray.data as rd
    from ics_search_engine_ray.stages.events import mode_per_key
    rng = np.random.default_rng(11)
    users = rng.integers(0, 20, 500)
    vals = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, 500)]
    tbl = pa.table({"user_id": pa.array(users, pa.int64()),
                    "event_type": pa.array(vals, pa.string())})

    def brute():
        best = {}
        for u, v in zip(users.tolist(), vals.tolist()):
            best.setdefault(u, {}).setdefault(v, 0)
            best[u][v] += 1
        return sorted((u, min((-n, v) for v, n in d.items())[1],
                       max(d.values())) for u, d in best.items())

    want = brute()
    for parts in (1, 7):
        ev = rd.from_arrow(tbl).repartition(parts)
        got = sorted((r["user_id"], r["top_val"], r["n"])
                     for b in mode_per_key(ev).iter_batches(
                         batch_format="pyarrow") for r in b.to_pylist())
        assert got == want


def _semi_inputs():
    import ray.data as rd
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 5], pa.int64()),
        "x": pa.array(list("abcdef"), pa.string())})).repartition(3)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 2, 5, 9], pa.int64())})).repartition(2)
    return left, right


def test_semi_join_broadcast_and_hash_paths(ray_session):
    from ics_search_engine_ray.stages.joins import semi_join
    want = [(2, "b"), (5, "e"), (5, "f")]
    for gate in (1_000_000, 1):   # force broadcast, then hash path
        left, right = _semi_inputs()
        got = sorted((r["k"], r["x"]) for b in semi_join(
            left, right, on="k", right_on="rk",
            max_bcast_rows=gate).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist())
        assert got == want, gate


def test_left_outer_zero_fill(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd
    from ics_search_engine_ray.stages.joins import broadcast_join
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64())}))
    counts = pa.table({"rk": pa.array([2], pa.int64()),
                       "count()": pa.array([4], pa.int64())})
    out = broadcast_join(left, counts, on="k", right_on="rk",
                         join_type="left outer")
    got = sorted(
        (r["k"], r["n"]) for b in out.map_batches(
            lambda b: pa.table({
                "k": b.column("k"),
                "n": pc.coalesce(b.column("count()"),
                                 pa.scalar(0)).cast(pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        for r in b.to_pylist())
    assert got == [(1, 0), (2, 4), (3, 0)]
