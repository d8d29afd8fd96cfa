"""Whole-table validation: the ``x-spark`` extension block executed.

A constraint spec may carry an ``x-spark`` object declaring the
dataset-scope checks that have no row-local JSON-Schema analogue::

    "x-spark": {
        "unique": ["image_id", "phash"],
        "referential": [{"column": "license_id",
                         "ref": {"table": "licenses", "key": "license_id"}}],
        "stats": {"caption": {"max_null_rate": 0.01}},
        "drift": {"baseline": "<path>",
                  "numeric": {"w": [0.0, 16384.0, 32]},
                  "categorical": ["fmt"]},     # add "by": "fmt" for
                                               # per-partition scoring
        "pixel_invariant": {"min_psnr": 40.0,
                            "decode": "auto"},   # "stub"|"real"|"auto"
        "phash_integrity": {"max_hamming": 0},
        "near_dup_phash": {"max_hamming": 3, "max_pairs": 0,
                           "strategy": "banded"},
        "repetition": {"column": "text",          # Gopher Table A1
                       "max_top": {"2": 0.20},    # n -> max char frac
                       "max_dup": {"5": 0.15}},   # omit both: defaults
        "pii": {"column": "text", "max_hits": 0},
        "contamination": {"column": "text", "ref_table": "benchmark",
                          "ref_column": "text", "n": 13,
                          "max_frac": 0.0, "on_hash": true},
        "image_quality": {"min_aspect": 0.05, "max_aspect": 20.0,
                          "min_pixels": 1024, "min_bytes": 16},
        "image_quality_decoded": {"min_luma": 20, "max_luma": 235,
                                  "min_contrast": 2},  # real-decode tier
        "alignment": {"image_col": "img_vec", "text_col": "txt_vec",
                      "min_cosine": 0.5,
                      "method": "native"}   # "arrow" = BLAS batch path
    }

``validate_dataset`` compiles the row-level keywords through the normal
registry AND runs every declared dataset check, returning one unified
violation-rows DataFrame (same schema as ``CompiledValidator.violations``)
— the engine's complete answer to BASELINE.json's north_star.

Physical notes: the row pass is one narrow scan; each uniqueness check is
one key shuffle; referential checks broadcast small dims; stats is one
agg; drift compares pre-aggregated histograms; only the pixel-invariant /
phash-integrity stage is Python (Arrow-batched) and only it reads
``bytes``.  ``pixel_invariant``'s decode tier is an explicit option:
``"decode": "stub"`` (synthetic-header fast path), ``"real"`` (the
built-in BMP/PNG/JPEG/WebP codecs), or ``"auto"`` (default) which
resolves to "real" when ``phash_integrity`` is also configured — the
recompute needs real pixels anyway, so the two checks then share ONE
fused decode pass — and "stub" standalone.  Pin "stub" or "real" when
the verdict must not depend on which other blocks are present.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .validator import CompiledValidator

VIOLATION_COLS = ("keyword", "json_path", "schema_path", "message",
                  "failing_value")


def validate_dataset(df: DataFrame, schema: dict,
                     id_cols: Sequence[str] = (),
                     tables: Optional[Mapping[str, DataFrame]] = None,
                     registry: Any = None,
                     schema_store: Optional[dict] = None,
                     format_checker: bool = False,
                     retrieve=None) -> DataFrame:
    """Row-level + x-spark dataset checks -> unified violation rows.
    `schema_store`/`format_checker`/`retrieve` forward to the row-level
    :class:`CompiledValidator` (same semantics as constructing one)."""
    xs = schema.get("x-spark", {}) or {}
    if xs:
        # CompiledValidator only meta-checks the row keywords it is
        # given; validate the stripped extension block explicitly so a
        # config typo fails here, not mid-job (spec._check_x_spark)
        from .spec import _check_x_spark
        _check_x_spark(xs, "#/x-spark")
    row_schema = {k: v for k, v in schema.items() if k != "x-spark"}
    v = CompiledValidator(row_schema, df, registry,
                          schema_store=schema_store,
                          format_checker=format_checker,
                          retrieve=retrieve)
    keep = list(id_cols)

    def pad(frame: DataFrame) -> DataFrame:
        cols = set(frame.columns)
        out = frame
        for c in keep:
            if c not in cols:
                out = out.withColumn(c, F.lit(None).cast("string"))
        return out.select(*keep, *VIOLATION_COLS)

    parts = [v.violations(df, keep)]

    for key in xs.get("unique", []):
        from .operators.uniqueness import uniqueness_violations
        parts.append(pad(uniqueness_violations(df, key, keep)))

    for ref in xs.get("referential", []):
        from .operators.referential import referential_violations
        table = ref["ref"]["table"]
        if tables is None or table not in tables:
            raise ValueError(f"x-spark referential check needs table "
                             f"{table!r} in `tables`")
        parts.append(pad(referential_violations(
            df, ref["column"], tables[table], ref["ref"]["key"], keep)))

    if "stats" in xs:
        from .operators.stats import stats_violations
        parts.append(pad(stats_violations(df, xs["stats"])))

    if "drift" in xs:
        d = xs["drift"]
        numeric = {c: tuple(v) for c, v in (d.get("numeric") or {}).items()}
        # `is None`, not dict-default: a present-but-JSON-null key also
        # means "use the default" (0.0 is a legitimate max_ks)
        max_ks = 0.1 if d.get("max_ks") is None else d["max_ks"]
        max_l1 = d.get("max_l1")
        by = d.get("by")
        if by:
            # per-partition mode (north_star: "distribution-drift checks
            # comparing per-partition histograms/KS statistics against a
            # baseline snapshot"): one distributed partitioned_drift pass
            # per numeric column, each tripped partition its own row
            from .operators.drift import load_baseline, partitioned_drift

            def _drow(kw, col, stat_col, threshold, label):
                return F.struct(
                    F.lit(kw).alias("keyword"),
                    F.lit(f"$.{col}").alias("json_path"),
                    F.lit(f"x-spark/drift/{col}/{stat_col}")
                    .alias("schema_path"),
                    F.concat(F.lit(f"partition {by}="),
                             F.col("part").cast("string"),
                             F.lit(f": {label} "),
                             # %.4f, not round().cast: fixed-width
                             # rendering a SQL oracle reproduces exactly
                             F.format_string("%.4f", F.col(stat_col)),
                             F.lit(f" exceeds {threshold}"))
                    .alias("message"),
                    F.format_string("%.6f", F.col(stat_col))
                    .alias("failing_value"))

            for col, (lo, hi, bins) in numeric.items():
                base = load_baseline(df.sparkSession, d["baseline"], col)
                if not base.limit(1).count():
                    # empty baseline would make every CDF term NULL and
                    # the check a silent pass — misconfiguration, not
                    # drift; fail loudly (baseline tables are tiny)
                    raise ValueError(
                        f"baseline at {d['baseline']!r} has no histogram "
                        f"for column {col!r} — was it saved with this "
                        f"column in `numeric`?")
                stats = partitioned_drift(df, by, col, lo, hi, bins, base)
                structs = [F.when(F.col("ks") > max_ks,
                                  _drow("drift:ks", col, "ks", max_ks,
                                        "KS statistic"))]
                if max_l1 is not None:
                    structs.append(F.when(F.col("l1") > max_l1,
                                          _drow("drift:l1", col, "l1",
                                                max_l1, "L1 distance")))
                v = (stats.select(
                    F.explode(F.filter(F.array(*structs),
                                       lambda s: s.isNotNull()))
                    .alias("_v")).select("_v.*"))
                parts.append(pad(v))
        else:
            from .operators.drift import check_against_baseline
            viol = check_against_baseline(df, d["baseline"],
                                          numeric=numeric,
                                          categorical=(d.get("categorical")
                                                       or ()),
                                          max_ks=max_ks, max_l1=max_l1)
            if viol is not None:
                parts.append(pad(viol))

    # pixel_invariant decode tier is EXPLICIT ("decode": "stub"|"real"|
    # "auto"): "auto" (the default) keeps the fusion heuristic — real
    # codecs when phash_integrity is also configured (its recompute
    # needs real pixels anyway, so one fused decode serves both),
    # stub-header decode standalone.  Pinning "stub" or "real" makes
    # the tier independent of other blocks (an unrelated
    # phash_integrity addition must not silently flip pixel_invariant
    # verdicts for payloads the stub accepts but real codecs reject).
    pix_cfg = (xs["pixel_invariant"] or {}) if "pixel_invariant" in xs \
        else None
    pix_tier = None
    if pix_cfg is not None:
        pix_tier = pix_cfg.get("decode", "auto")
        if pix_tier == "auto":
            pix_tier = "real" if "phash_integrity" in xs else "stub"
    fuse_pixel = pix_tier == "real" and "phash_integrity" in xs
    fuse_luma = ("image_quality_decoded" in xs
                 and "phash_integrity" in xs)
    # pixel_invariant (real tier) + image_quality_decoded WITHOUT a
    # phash pass: one decode_luma_stats(with_psnr=True) scan feeds both
    # violation streams — decoding must not run twice in ANY block
    # combination (review finding r5)
    fuse_pix_luma = (pix_tier == "real"
                     and "image_quality_decoded" in xs
                     and "phash_integrity" not in xs)

    if pix_cfg is not None and not fuse_pixel and not fuse_pix_luma:
        from .operators.multimodal import psnr_check, psnr_check_real
        check = psnr_check_real if pix_tier == "real" else psnr_check
        parts.append(pad(check(df,
                               min_psnr=pix_cfg.get("min_psnr", 40.0))))

    if "phash_integrity" in xs:
        # stored phash must equal (within max_hamming) the perceptual
        # hash recomputed from decoded pixels; undecodable rows are the
        # pixel_invariant's finding, not a phash mismatch.  When the
        # pixel-invariant and/or decoded-tier quality checks are also
        # configured, ONE fused real-decode pass feeds every violation
        # stream — decoding bytes is the expensive stage and must not
        # run twice.
        from .operators.multimodal import phash_integrity_check
        cfg = xs["phash_integrity"] or {}
        maxh = cfg.get("max_hamming", 0)
        chk = phash_integrity_check(
            df, carry=("w", "h") if fuse_pixel else (),
            with_psnr=fuse_pixel, with_luma=fuse_luma)

        def _vrow(keyword, json_path, schema_path, message, failing):
            return F.struct(F.lit(keyword).alias("keyword"),
                            F.lit(json_path).alias("json_path"),
                            F.lit(schema_path).alias("schema_path"),
                            message.alias("message"),
                            failing.alias("failing_value"))

        integ_bad = F.col("hamming") > maxh
        integ_struct = F.when(integ_bad, _vrow(
            "phashIntegrity", "$.phash", "x-spark/phash_integrity",
            F.concat(F.lit("stored phash differs from recomputed "
                           "pixel hash by "),
                     F.col("hamming").cast("string"), F.lit(" bits")),
            F.col("stored_phash").cast("string")))
        structs = [integ_struct]
        if fuse_pixel:
            from .operators.quality import pixel_invariant_struct
            structs.append(pixel_invariant_struct(
                pix_cfg.get("min_psnr", 40.0)))
        if fuse_luma:
            from .operators.quality import luma_quality_structs
            structs += luma_quality_structs(
                xs["image_quality_decoded"])
        # ONE projection over the single decode subtree emits every
        # violation type — a union of per-type filters would reference
        # (and re-execute) the mapInPandas decode once per branch
        bad = (chk.select(
            "image_id",
            F.explode(F.filter(F.array(*structs),
                               lambda s: s.isNotNull())).alias("_v"))
            .select("image_id", "_v.*"))
        parts.append(pad(bad))

    if "image_quality_decoded" in xs and not fuse_luma:
        # decoded-tier quality standalone (no phash-integrity subtree
        # to ride); when the real-tier pixel invariant is ALSO
        # configured its PSNR/metadata stream rides this same decode
        # (fuse_pix_luma — one mapInPandas pass, two violation streams)
        from .operators.multimodal import decode_luma_stats
        from .operators.quality import luma_quality_structs
        st = decode_luma_stats(df,
                               carry=("w", "h") if fuse_pix_luma else (),
                               with_psnr=fuse_pix_luma)
        lstructs = list(luma_quality_structs(xs["image_quality_decoded"]))
        if fuse_pix_luma:
            from .operators.quality import pixel_invariant_struct
            lstructs.append(pixel_invariant_struct(
                pix_cfg.get("min_psnr", 40.0)))
        bad = (st.select(
            "image_id",
            F.explode(F.filter(F.array(*lstructs),
                               lambda s: s.isNotNull())).alias("_v"))
            .select("image_id", "_v.*"))
        parts.append(pad(bad))

    if "near_dup_phash" in xs:
        # dataset-level assertion: at most max_pairs near-duplicate
        # images by phash hamming <= max_hamming (one aggregate
        # violation row, mirroring the stats assertions)
        from .operators.dedup import phash_near_duplicates
        cfg = xs["near_dup_phash"] or {}
        maxh = cfg.get("max_hamming", 3)
        maxp = cfg.get("max_pairs", 0)
        pairs = phash_near_duplicates(
            df, "image_id", "phash", max_hamming=maxh,
            strategy=cfg.get("strategy", "banded"))
        agg = (pairs.agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > maxp)
               .select(
                   F.lit("nearDup:phash").alias("keyword"),
                   F.lit("$.phash").alias("json_path"),
                   F.lit("x-spark/near_dup_phash").alias("schema_path"),
                   F.concat(F.col("_n").cast("string"),
                            F.lit(f" near-duplicate image pairs at "
                                  f"hamming <= {maxh} (allowed "
                                  f"{maxp})")).alias("message"),
                   F.col("_n").cast("string").alias("failing_value")))
        parts.append(pad(agg))

    if "repetition" in xs:
        # Gopher-style repetition thresholds as per-row violations
        # (operators/repetition.py: zero-shuffle sorted-run fold)
        from .operators.repetition import (dup_ngram_char_frac,
                                           top_ngram_char_frac)
        cfg = xs["repetition"] or {}
        col = cfg.get("column", "text")
        max_top = {int(k): float(v)
                   for k, v in (cfg.get("max_top") or {}).items()}
        max_dup = {int(k): float(v)
                   for k, v in (cfg.get("max_dup") or {}).items()}
        if not max_top and not max_dup:    # Gopher Table A1 defaults
            max_top = {2: 0.20, 3: 0.18, 4: 0.16}
            max_dup = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11,
                       10: 0.10}
        t = F.col(col)

        def _rrow(kind, n, lim, frac):
            return F.when(frac > lim, F.struct(
                F.lit(f"repetition:{kind}{n}").alias("keyword"),
                F.lit(f"$.{col}").alias("json_path"),
                F.lit(f"x-spark/repetition/{kind}_{n}gram")
                 .alias("schema_path"),
                F.concat(F.lit(f"{kind} {n}-gram char fraction "),
                         F.format_string("%.6f", frac),
                         F.lit(f" exceeds {lim}")).alias("message"),
                F.format_string("%.6f", frac).alias("failing_value")))

        structs = [_rrow("top", n, lim, top_ngram_char_frac(t, n))
                   for n, lim in sorted(max_top.items())]
        structs += [_rrow("dup", n, lim, dup_ngram_char_frac(t, n))
                    for n, lim in sorted(max_dup.items())]
        viol = (df.select(
            *keep,
            F.explode(F.filter(F.array(*structs),
                               lambda s: s.isNotNull())).alias("_v"))
            .select(*keep, "_v.*"))
        parts.append(pad(viol))

    if "pii" in xs:
        # PII budget per row (operators/pii.py: zero-shuffle regexps)
        from .operators.pii import PII_PATTERNS, pii_counts
        cfg = xs["pii"] or {}
        col = cfg.get("column", "text")
        max_hits = cfg.get("max_hits", 0)
        c = pii_counts(F.col(col))
        total = sum((c.getField(f"n_{n}") for n in PII_PATTERNS),
                    F.lit(0).cast("long"))
        viol = (df.select(*keep, total.alias("_n"))
                .filter(F.col("_n") > max_hits)
                .select(
                    *keep,
                    F.lit("pii").alias("keyword"),
                    F.lit(f"$.{col}").alias("json_path"),
                    F.lit("x-spark/pii").alias("schema_path"),
                    F.concat(F.col("_n").cast("string"),
                             F.lit(f" PII matches exceed allowed "
                                   f"{max_hits}")).alias("message"),
                    F.col("_n").cast("string").alias("failing_value")))
        parts.append(pad(viol))

    if "image_quality" in xs:
        # metadata-tier image quality (operators/quality.py): aspect /
        # pixel-count / payload-size bands, pure Columns on the same
        # narrow scan as the row keywords — zero extra passes
        from .operators.quality import image_quality_violations
        parts.append(pad(image_quality_violations(df, xs["image_quality"],
                                                  keep)))

    if "alignment" in xs:
        # caption-image embedding alignment (CLIP-score seam): one
        # codegen'd zip_with/aggregate cosine per row, no shuffle
        from .operators.quality import alignment_violations
        parts.append(pad(alignment_violations(df, xs["alignment"], keep)))

    if "contamination" in xs:
        # benchmark decontamination as per-row violations
        # (operators/contamination.py: broadcast gram join)
        from .operators.contamination import ngram_contamination
        cfg = xs["contamination"]
        ref_name = cfg["ref_table"]
        if tables is None or ref_name not in tables:
            raise ValueError(f"x-spark contamination check needs table "
                             f"{ref_name!r} in `tables`")
        if not keep:
            raise ValueError("x-spark contamination check needs id_cols "
                             "(violations are reported per document id)")
        col = cfg.get("column", "text")
        max_frac = cfg.get("max_frac", 0.0)
        sc = ngram_contamination(
            df, tables[ref_name], id_col=keep[0], text_col=col,
            ref_text_col=cfg.get("ref_column", col),
            n=cfg.get("n", 13), on_hash=cfg.get("on_hash", True))
        viol = (sc.filter(F.col("contaminated_frac") > max_frac)
                .select(
                    F.col(keep[0]),
                    F.lit("contamination").alias("keyword"),
                    F.lit(f"$.{col}").alias("json_path"),
                    F.lit("x-spark/contamination").alias("schema_path"),
                    F.concat(F.col("n_hit").cast("string"),
                             F.lit(" of "),
                             F.col("n_grams").cast("string"),
                             F.lit(f" {cfg.get('n', 13)}-grams appear in "
                                   f"{ref_name} (allowed frac "
                                   f"{max_frac})")).alias("message"),
                    F.format_string("%.6f", F.col("contaminated_frac"))
                     .alias("failing_value")))
        parts.append(pad(viol))

    out = parts[0].select(*keep, *VIOLATION_COLS)
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def full_check_counts(df: DataFrame, schema: dict,
                      unique_keys: Sequence[str] = (),
                      referential: Optional[Sequence[tuple]] = None,
                      isin_max_keys: int = 10_000,
                      image_quality: Optional[dict] = None,
                      ) -> dict:
    """Scan-fused dataset check: validation counts, per-key duplicate
    groups, and referential orphan counts in **one keyed pass per unique
    key** (plus zero extra passes for validation/referential).

    The insight: a uniqueness check already pays one groupBy(key) pass
    over every row, and that pass can CARRY the per-row work — the
    is_valid predicate sum and the broadcast-dim membership test ride
    along as aggregate expressions, so "validate + unique(image_id) +
    unique(phash) + referential" costs 2 scans/shuffles instead of 4
    jobs.  Small referential dims (<= `isin_max_keys` distinct keys)
    are collected driver-side and compiled into codegen'd `isin`
    membership sets — no join node at all; bigger dims become a
    broadcast-hash-join membership flag riding the SAME fused pass (an
    unbounded `isin` would blow up the expression tree where a
    broadcast join would not).

    `referential` is a sequence of (fk_col, dim_df, dim_key).
    `image_quality` (an x-spark image_quality-style cfg dict) rides the
    SAME fused pass: each quality band becomes one more
    sum(predicate) aggregate expression — zero extra scans or jobs.
    Returns {"rows", "invalid_rows", "dup_groups": {key: n},
    "orphans": {fk_col: n}[, "quality": {keyword: n}]}.
    """
    from .validator import CompiledValidator

    v = CompiledValidator({k: s for k, s in schema.items()
                           if k != "x-spark"}, df)
    valid = F.coalesce(v.valid_column, F.lit(True))
    extra_aggs = [F.count(F.lit(1)).alias("_c"),
                  F.sum((~valid).cast("long")).alias("_bad")]
    quality_cols: dict[str, str] = {}
    if image_quality:
        from .operators.quality import image_quality_flags
        for j, (kw, pred) in enumerate(
                sorted(image_quality_flags(image_quality).items())):
            col = f"_q{j}"
            extra_aggs.append(
                F.sum(F.coalesce(pred, F.lit(False)).cast("long"))
                .alias(col))
            quality_cols[kw] = col
    orphan_cols: dict[str, str] = {}
    fused_df = df  # first fused pass only; extra key passes stay on df
    for i, (fk, dim_df, dim_key) in enumerate(referential or ()):
        # limit(N+1) probe: one cheap job tells us whether the dim fits
        # the isin tier without a full count.  NULL dim keys are
        # dropped BEFORE the isin list is built: `x NOT IN (..., NULL)`
        # is SQL-NULL for every non-member, which would silently zero
        # the orphan count (the join tier is naturally immune — NULL
        # never equi-joins)
        probe = (dim_df.select(dim_key)
                 .where(F.col(dim_key).isNotNull()).distinct()
                 .limit(isin_max_keys + 1).collect())
        if len(probe) <= isin_max_keys:
            miss = F.col(fk).isNotNull() & ~F.col(fk).isin(
                [r[0] for r in probe])
        else:
            flag = f"_dimhit{i}"
            dim = (dim_df.select(F.col(dim_key).alias(fk))
                   .distinct().withColumn(flag, F.lit(1)))
            # join only the frame used by the FIRST fused pass —
            # later duplicate-count passes need no referential work
            # and run on the original df (ADVICE-r3)
            fused_df = fused_df.join(F.broadcast(dim), fk, "left")
            miss = F.col(fk).isNotNull() & F.col(flag).isNull()
        extra_aggs.append(F.sum(miss.cast("long")).alias(f"_orph{i}"))
        orphan_cols[fk] = f"_orph{i}"

    out: dict = {"dup_groups": {}, "orphans": {}}
    if quality_cols:
        out["quality"] = {}
    keys = list(unique_keys) or ["__nogroup__"]
    first = True
    for key in keys:
        if key == "__nogroup__":
            row = fused_df.agg(*extra_aggs).collect()[0]
            out["rows"] = row["_c"]
            out["invalid_rows"] = row["_bad"]
            for fk, c in orphan_cols.items():
                out["orphans"][fk] = row[c]
            for kw, c in quality_cols.items():
                out["quality"][kw] = row[c] or 0
            break
        if first:
            g = fused_df.groupBy(key).agg(*extra_aggs)
            agg = g.agg(
                F.sum("_c").alias("rows"),
                F.sum("_bad").alias("bad"),
                F.sum((F.col("_c") > 1).cast("long")).alias("dups"),
                *[F.sum(c).alias(c) for c in orphan_cols.values()],
                *[F.sum(c).alias(c) for c in quality_cols.values()],
            ).collect()[0]
            out["rows"] = agg["rows"]
            out["invalid_rows"] = agg["bad"] or 0
            out["dup_groups"][key] = agg["dups"] or 0
            for fk, c in orphan_cols.items():
                out["orphans"][fk] = agg[c] or 0
            for kw, c in quality_cols.items():
                out["quality"][kw] = agg[c] or 0
            first = False
        else:
            n = (df.groupBy(key).agg(F.count(F.lit(1)).alias("_c"))
                 .filter(F.col("_c") > 1).count())
            out["dup_groups"][key] = n
    return out
