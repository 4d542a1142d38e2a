"""Suite-hygiene guards (no Ray needed).

Round-3 incident: three ops (chars_histogram, retention_cohorts,
orders_profile) were silently SHADOWED when later waves reused their
dict keys — Python dict literals keep the last duplicate, so the older
op vanished from the graded surface and one of its kernels was also
shadowed by a duplicate top-level `def` in ops/events.py (its
hand-computed test failed unnoticed inside the winner's semantics).
These checks make that class of regression impossible to land quietly.
"""
import ast
import pathlib
import re
from collections import Counter

REPO = pathlib.Path(__file__).resolve().parent.parent


def _literal_keys(src: str, anchor: str) -> list[str]:
    m = re.search(anchor + r"\(\).*?\n    \}", src, re.S)
    assert m, anchor
    return re.findall(r'"([a-z0-9_]+)":', m.group(0))


def test_no_duplicate_query_or_oracle_keys():
    src = (REPO / "__ray_entry__.py").read_text()
    qkeys = _literal_keys(src, r"def queries")
    dups = [k for k, c in Counter(qkeys).items() if c > 1]
    assert not dups, f"duplicate queries() keys: {dups}"
    after = src[src.index("def oracle_sql"):]
    okeys = re.findall(r'^        "([a-z0-9_]+)": """', after, re.M)
    odups = [k for k, c in Counter(okeys).items() if c > 1]
    assert not odups, f"duplicate oracle_sql() keys: {odups}"
    # every oracle key must name a real query
    orphans = sorted(set(okeys) - set(qkeys))
    assert not orphans, f"oracle_sql keys with no queries() entry: {orphans}"


def test_no_duplicate_toplevel_defs():
    offenders = {}
    files = sorted((REPO / "pdf_extract_ray").rglob("*.py"))
    files += [REPO / "__ray_entry__.py", REPO / "bench.py"]
    for f in files:
        tree = ast.parse(f.read_text())
        names = [n.name for n in tree.body
                 if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                                   ast.ClassDef))]
        dups = [k for k, c in Counter(names).items() if c > 1]
        if dups:
            offenders[str(f.relative_to(REPO))] = dups
    assert not offenders, f"shadowed top-level defs: {offenders}"


def test_bench_ops_exist_and_unique():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry_hygiene", REPO / "__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qnames = set(mod.queries())
    bench = (REPO / "bench.py").read_text()
    m = re.search(r"def run_ops.*?\n    out = \{\}", bench, re.S)
    assert m
    ops = re.findall(r'"([a-z0-9_]+)"', m.group(0))
    dups = [k for k, c in Counter(ops).items() if c > 1]
    assert not dups, f"bench run_ops lists an op twice: {dups}"
    missing = sorted(set(ops) - qnames)
    assert not missing, f"bench run_ops names unknown queries: {missing}"
