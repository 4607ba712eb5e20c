"""Guard the driver contract: ``__ray_entry__`` must expose entry() /
queries() / oracle_sql() with consistent keys, never init Ray itself, and
entry() must produce rows with a stable schema (the driver smoke check).
"""

import importlib.util
import os

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location("__ray_entry__", os.path.join(REPO, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_module_contract():
    mod = _load_entry_module()
    q = mod.queries()
    sqls = mod.oracle_sql()
    assert len(q) >= 65
    # every oracle key must have a runnable query
    assert set(sqls) <= set(q)
    # the non-SQL entries are the known engine-defined families only
    no_oracle = set(q) - set(sqls)
    for name in no_oracle:
        assert any(
            name.startswith(p)
            for p in ("clips_", "minhash", "near_dup_clusters", "ngram_jaccard_documents",
                      "knn_embeddings_", "knn_lsh_recall", "knn_ivf_recall", "knn_pq_recall",
                      "embedding_near", "image_", "video_",
                      "role_validation", "kmeans_", "pack_", "containment_", "bpe_")
        ), f"unexpected rows-only query {name!r}"


def test_entry_runs_and_returns_rows():
    mod = _load_entry_module()
    out = mod.entry()
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert isinstance(df, pd.DataFrame)
    assert len(df) >= 0 and len(df.columns) > 0


def test_no_ray_init_in_entry_or_library():
    """The driver owns the session: nothing under the package or the entry
    module may call ray.init()/ray.shutdown() (bench/cli/tests excepted)."""
    import ast

    offenders = []
    paths = [os.path.join(REPO, "__ray_entry__.py")]
    pkg = os.path.join(REPO, "ndap_data_validator_ray")
    for root, _dirs, files in os.walk(pkg):
        paths += [os.path.join(root, f) for f in files if f.endswith(".py")]
    for p in paths:
        if p.endswith("cli.py"):
            continue  # cli owns its session by design
        tree = ast.parse(open(p).read())
        for node in ast.walk(tree):  # actual CALLS only, not docstring mentions
            if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
                if node.func.attr in ("init", "shutdown") and isinstance(node.func.value, ast.Name):
                    if node.func.value.id == "ray":
                        offenders.append(f"{os.path.relpath(p, REPO)}:{node.lineno}")
    assert not offenders, offenders
