"""Thin CLI-surface guards (no Ray session): the op registry lists every
queries() entry, and argparse wiring for the new subcommands parses."""

import subprocess
import sys


def test_op_list_matches_registry():
    out = subprocess.run(
        [sys.executable, "-m", "ics_search_engine_ray", "op", "--list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert out.returncode == 0, out.stderr
    names = [l.strip() for l in out.stdout.splitlines() if l.strip()]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    E = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(E)
    assert sorted(names) == sorted(E.queries().keys())


def test_federated_cli_rejects_operator_flags():
    out = subprocess.run(
        [sys.executable, "-m", "ics_search_engine_ray", "query",
         "--index", "/tmp/nope1,/tmp/nope2", "--boolean", "q"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert out.returncode == 2
    assert "unsupported" in out.stderr


def test_op_out_guard_refuses_foreign_dir(tmp_path):
    from ics_search_engine_ray.pipelines.cli import _guard_clear_out
    import pytest
    d = tmp_path / "precious"
    d.mkdir()
    (d / "notes.txt").write_text("do not delete")
    with pytest.raises(SystemExit, match="refusing to clear"):
        _guard_clear_out(str(d))
    assert (d / "notes.txt").exists()
    # --force overrides
    _guard_clear_out(str(d), force=True)
    assert not d.exists()


def test_op_out_guard_clears_previous_op_output(tmp_path):
    from ics_search_engine_ray.pipelines.cli import _guard_clear_out
    d = tmp_path / "out"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x")
    (d / "_SUCCESS").write_bytes(b"")
    _guard_clear_out(str(d))
    assert not d.exists()
    _guard_clear_out(str(d))            # absent: no-op
