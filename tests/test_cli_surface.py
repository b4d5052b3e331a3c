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
