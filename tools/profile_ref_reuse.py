#!/usr/bin/env python
"""One-off diagnostic: how much $ref re-expansion in the issue232
(Swagger 2.0 meta-schema) compile is *exact duplication* — same
referent, same instance location, same binding — i.e. how much a
compile-time memo could save.  Not part of the test suite."""
from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS = "/root/reference/jsonschema/benchmarks/issue232/issue.json"


def main() -> None:
    import pyspark.sql.functions as F

    from jsonschema_spark.compiler import applicators as ap
    from jsonschema_spark.compiler.context import CompileContext
    from jsonschema_spark.compiler import registry as regmod
    from jsonschema_spark.conformance import (_registry_for_draft,
                                              base_resolver,
                                              infer_spark_type_document)
    from jsonschema_spark.session import get_spark

    with open(CORPUS) as fh:
        case = json.load(fh)[0]
    schema = case["schema"]
    inst = case["tests"][0]["data"]

    spark = get_spark("profile-ref", cores=1, shuffle_partitions=1)
    spark.sparkContext.setLogLevel("ERROR")

    ref_keys: Counter = Counter()
    sub_keys: Counter = Counter()
    timings: dict = {}

    orig_ref = ap._compile_referent
    orig_sub = regmod.compile_subschema

    def memo_key(ctx, referent):
        return (id(referent), ctx.json_path,
                ctx.dtype.simpleString() if ctx.dtype is not None else None,
                ctx.null_is_absent, ctx.statically_absent,
                ctx.base_uri, ctx.dynamic_scope, ctx.absent_policy)

    def spy_ref(ctx, referent, rbase, ref):
        k = memo_key(ctx, referent)
        first = k not in ref_keys
        ref_keys[k] += 1
        t0 = time.perf_counter()
        out = orig_ref(ctx, referent, rbase, ref)
        dt = time.perf_counter() - t0
        if first:
            timings[k] = dt
        return out

    def spy_sub(ctx, s):
        if isinstance(s, dict):
            sub_keys[(id(s), ctx.json_path,
                      ctx.dtype.simpleString() if ctx.dtype is not None
                      else None, ctx.null_is_absent,
                      ctx.statically_absent)] += 1
        return orig_sub(ctx, s)

    ap._compile_referent = spy_ref
    regmod.compile_subschema = spy_sub
    # applicators imports compile_subschema by name in places — patch both
    for mod in (ap,):
        if hasattr(mod, "compile_subschema"):
            mod.compile_subschema = spy_sub

    dtype = infer_spark_type_document(inst)
    registry = _registry_for_draft("draft4")
    res = base_resolver("draft4").child()
    root_uri = res.add_root(schema)
    t0 = time.perf_counter()
    ctx = CompileContext(registry=registry, target=F.col("value"),
                         dtype=dtype, root_schema=schema,
                         null_is_absent=True, absent_policy=True,
                         resolver=res, base_uri=root_uri,
                         dynamic_scope=(root_uri,))
    node = orig_sub(ctx, schema)
    total = time.perf_counter() - t0

    n_ref = sum(ref_keys.values())
    dup_ref = n_ref - len(ref_keys)
    # time attributable to duplicate expansions (first-expansion cost
    # x extra occurrences, nested so this overcounts; report anyway)
    dup_time = sum(timings.get(k, 0) * (c - 1)
                   for k, c in ref_keys.items() if c > 1)
    n_sub = sum(sub_keys.values())
    dup_sub = n_sub - len(sub_keys)
    print(f"compile total: {total:.1f}s  checks={len(node.checks)} "
          f"context={len(node.context)}")
    print(f"_compile_referent calls: {n_ref}  unique keys: "
          f"{len(ref_keys)}  duplicates: {dup_ref} "
          f"({100*dup_ref/max(n_ref,1):.0f}%)")
    print(f"  time inside duplicate expansions (overlapping): "
          f"{dup_time:.1f}s")
    print(f"compile_subschema dict calls: {n_sub}  unique: "
          f"{len(sub_keys)}  duplicates: {dup_sub} "
          f"({100*dup_sub/max(n_sub,1):.0f}%)")
    top = [(c, k[1][:60]) for k, c in ref_keys.most_common(8)]
    for c, jp in top:
        print(f"  x{c}  {jp}")
    spark.stop()


if __name__ == "__main__":
    main()
