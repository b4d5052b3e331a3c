"""Cross-crawl lifecycle report (stages/dedup_text.py recrawl_diff)."""
import pyarrow as pa

from ics_search_engine_ray.stages.dedup_text import recrawl_diff


def _rows(ds):
    return {r["source"]: (r["n_unchanged"], r["n_changed"], r["n_new"],
                          r["n_deleted"]) for r in ds.take_all()}


def test_all_four_statuses(ray_session):
    import ray.data as rd
    old = rd.from_items([
        {"doc_id": 1, "text": "same", "source": "a"},
        {"doc_id": 2, "text": "will change", "source": "a"},
        {"doc_id": 3, "text": "will vanish", "source": "b"},
        {"doc_id": 4, "text": "also same", "source": "b"}])
    new = rd.from_items([
        {"doc_id": 1, "text": "same", "source": "a"},
        {"doc_id": 2, "text": "changed!", "source": "a"},
        {"doc_id": 4, "text": "also same", "source": "b"},
        {"doc_id": 5, "text": "fresh", "source": "b"}])
    assert _rows(recrawl_diff(new, old)) == {
        "a": (1, 1, 0, 0), "b": (1, 0, 1, 1)}


def test_deleted_only_run_at_partition_tail(ray_session):
    """An old-only doc_id that sorts LAST in its partition exercises the
    clipped second-row index (the out-of-bounds edge)."""
    import ray.data as rd
    old = rd.from_items([
        {"doc_id": i, "text": f"t{i}", "source": "s"} for i in range(8)])
    new = rd.from_items([
        {"doc_id": i, "text": f"t{i}", "source": "s"} for i in range(4)])
    assert _rows(recrawl_diff(new, old, num_groups=3)) == {
        "s": (4, 0, 0, 4)}


def test_empty_new_side(ray_session):
    import ray.data as rd
    old = rd.from_items([
        {"doc_id": 1, "text": "x", "source": "a"},
        {"doc_id": 2, "text": "y", "source": "b"}])
    new = rd.from_items([
        {"doc_id": 9, "text": "z", "source": "a"}]).filter(
        lambda r: False)
    assert _rows(recrawl_diff(new, old)) == {
        "a": (0, 0, 0, 1), "b": (0, 0, 0, 1)}


def test_group_invariance(ray_session, sf_dir):
    import ray.data as rd
    docs = rd.read_parquet(sf_dir + "/documents.parquet",
                           columns=["doc_id", "text", "source"])
    new = docs.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"), "text": b.column("text"),
            "source": b.column("source")}), batch_format="pyarrow")
    a = _rows(recrawl_diff(new, docs, num_groups=2))
    b = _rows(recrawl_diff(new, docs, num_groups=97))
    assert a == b
    assert all(v[1] == v[2] == v[3] == 0 for v in a.values())
