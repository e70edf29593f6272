import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pdf_to_text_ray.pipelines.builder import (
    CompiledSegmenter,
    SegmentConfig,
    Stage,
    build_pipeline,
)
from pdf_to_text_ray.stages.segment import extract_blocks, parse_block_records


def test_default_config_matches_reference_segmenter():
    seg = SegmentConfig().compile()
    text = ("noise\nSucursal 7 - X\n8412345678905 2 24.95\n"
            "* Total importe en la sucursal: 49.90\nSucursal 8 - Y\ntail")
    assert seg.extract_blocks(text) == extract_blocks(text)
    blk = seg.extract_blocks(text)[0]
    assert seg.parse_records(blk) == parse_block_records(blk)


def test_custom_markers():
    cfg = SegmentConfig(start_marker="store", end_pattern=r"-- end of store --",
                        record_pattern=r"^(\w+)\s+(\d+)\s+(\d+\.\d+)$")
    seg = cfg.compile()
    text = "Store A\nsku1 2 10.50\n-- END OF STORE --\nignored"
    blocks = seg.extract_blocks(text)
    assert len(blocks) == 1
    assert seg.parse_records(blocks[0]) == [("A", "sku1", 2, 10.5)]


def test_build_pipeline_chains_stages(ray_session):
    import ray.data as rd

    ds = rd.range(100).map_batches(
        lambda t: pa.table({"x": t["id"]}), batch_format="pyarrow")
    stages = [
        Stage("double", lambda t: pa.table({"x": pc.multiply(t["x"], 2)})),
        Stage("filter", lambda t: t.filter(pc.greater(t["x"], 100))),
    ]
    out = build_pipeline(ds, stages).to_pandas()
    assert len(out) == 49 and out["x"].min() == 102


def test_actor_stage_requires_concurrency():
    class C:
        def __call__(self, b):
            return b

    with pytest.raises(ValueError, match="concurrency"):
        Stage("c", C).apply(None)


def test_no_shadowed_module_constants():
    """Guard against the recurring shadowed-constant bug class
    (_pii_sql, NTILE_SQL, BM25_SQL, BM25_TERMS): a later module-level
    assignment silently repoints every earlier query's oracle at the
    wrong SQL. Reject any duplicate top-level Name assignment in
    queries.py."""
    import ast
    import collections
    import pdf_to_text_ray.pipelines.queries as q

    tree = ast.parse(open(q.__file__).read())
    seen = collections.Counter()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    seen[t.id] += 1
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            seen[node.name] += 1
    dupes = [n for n, c in seen.items() if c > 1]
    assert not dupes, f"shadowed module-level names in queries.py: {dupes}"


def test_query_registry_integrity():
    """Registration drift guards: every oracle key has a query, no
    duplicate keys hide inside the QUERIES / ORACLE_SQL dict literals
    (a duplicate silently overrides the earlier entry — the dict
    builds fine), and every registered callable takes one positional
    sf_dir argument."""
    import ast
    import inspect

    import pdf_to_text_ray.pipelines.queries as Q

    assert set(Q.ORACLE_SQL) <= set(Q.QUERIES), \
        sorted(set(Q.ORACLE_SQL) - set(Q.QUERIES))

    src = inspect.getsource(Q)
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.Assign) and \
                getattr(node.targets[0], "id", "") in ("QUERIES",
                                                       "ORACLE_SQL"):
            keys = [k.value for k in node.value.keys]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, (node.targets[0].id, sorted(dupes))

    for name, fn in Q.QUERIES.items():
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty
                  and p.kind in (p.POSITIONAL_ONLY,
                                 p.POSITIONAL_OR_KEYWORD)]
        assert len(params) == 1, (name, params)
