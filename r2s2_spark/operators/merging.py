"""Stage M — table merging (denormalization of star-shaped subjects).

Reference counterpart: TableMergingConcurence.java:46-268 (step 4 of
Loader.STEPS; TableMerging.java is dead code). Algorithm kept faithful:

- merge candidates = tables whose subjects are unique (no repeating
  subject, probed as GROUP BY subject HAVING COUNT(*)>1 LIMIT 1,
  TableMergingConcurence.java:246-268);
- processed type-tables-first then smallest-first ("merge into small
  tables to generate denser columns", :81-100);
- ``other`` merges into ``mc`` when: same subject kind, no shared
  predicate, ``other`` not already a merge target, both non-empty, and
  the subject sets actually overlap (:201-230);
- the merge pulls ``other``'s physical object columns into ``mc`` for
  matching subjects (reference: UPDATE..FROM, :180-190) and removes the
  consumed rows from ``other`` (reference: DELETE..USING, :191-196).

Spark realization: UPDATE becomes a left join adding the columns; DELETE
becomes a left-anti join on the subject key. Deviation (documented): the
reference's DELETE also equi-compares the copied values, so rows whose
copied value is NULL are never deleted (NULL=NULL is unknown) — leaving
duplicate statements behind; we anti-join on the subject alone, which is
the intended semantics (both reconstruct to identical triple *sets*).

The composite subject key is concat with an explicit separator —
the reference's bare ``c1||c2`` (J4) is ambiguous ("ab"+"c" == "a"+"bc") —
and NULL parts propagate (concat, not concat_ws), matching DuckDB's
NULL||x = NULL: a subject with a NULL part never matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import Catalog, TableSpec

SEP = "\x00"


def subject_key(table: TableSpec) -> "F.Column":
    """concatSubjectColumns (TableMergingConcurence.java:232-244): physical
    columns by value, virtual columns inlined as literals.

    Keys are built from FULL lexical part values: a column's factored-out
    ``lcp_prefix`` (F3 substring strip) is prepended, exactly as
    reconstruction does (r2rml.py table_triples). Comparing stripped
    values cross-merged tables whose subjects share suffixes under
    different prefixes — e.g. .../nation/0 vs .../region/0 both stripped
    to '0' — silently attaching one entity's statements to another."""
    pieces = []
    for cs in table.subject_columns:
        if cs.physical:
            # physical NULL propagates -> row never matches (DuckDB
            # NULL||x = NULL in the reference's concat key); the prefix
            # concat preserves that (concat propagates NULL)
            v = F.col(cs.name).cast("string")
            if cs.lcp_prefix:
                v = F.concat(F.lit(cs.lcp_prefix), v)
            pieces.append(v)
        else:
            # an absent (all-NULL virtual) part is a *column* property, not
            # a row property: sentinel so two tables with the same absent
            # part still match (the reference string-concats Java null into
            # the literal 'null', same effect)
            full = (
                (cs.lcp_prefix or "") + cs.virtual_value
                if cs.virtual_value is not None
                else "\x01null"
            )
            pieces.append(F.lit(full).cast("string"))
        pieces.append(F.lit(SEP))
    return F.concat(*pieces[:-1]) if pieces else F.lit(None)


def has_repeating_subjects(df: DataFrame, table: TableSpec) -> bool:
    """A2 probe (GROUP BY .. HAVING COUNT(*)>1 LIMIT 1)."""
    phys = [cs.name for cs in table.subject_columns if cs.physical]
    if not phys:
        # all-virtual subject: every row IS the same subject, so >1 row
        # repeats. (The reference returns false here — empty column list,
        # TableMergingConcurence.java:249-251 — which would wrongly admit
        # multi-row single-subject tables as merge candidates.)
        return df.limit(2).count() > 1
    k = subject_key(table).alias("__k")
    return (
        df.groupBy(k).count().where(F.col("count") > 1).limit(1).count() > 0
    )


def subjects_overlap(mc_df: DataFrame, mc: TableSpec, other_df: DataFrame, other: TableSpec) -> bool:
    """J1 probe as a left-semi join with early exit (the reference runs a
    full COUNT(*) over the join, :211 — semi+limit is the Spark idiom)."""
    a = mc_df.select(subject_key(mc).alias("__k")).where(F.col("__k").isNotNull())
    b = other_df.select(subject_key(other).alias("__k")).where(F.col("__k").isNotNull())
    return a.join(b, "__k", "left_semi").limit(1).count() > 0


def merge_pair(
    mc_df: DataFrame, mc: TableSpec, other_df: DataFrame, other: TableSpec
) -> tuple[DataFrame, DataFrame]:
    """Merge ``other``'s predicate maps into ``mc``. Returns the new
    (mc_df, other_df). ``mc`` gains deep copies of the predicate maps;
    ``other`` keeps its own specs — its remaining (non-overlapping) rows
    still represent statements of that predicate, exactly like the
    reference where the same PredicateMap ends up on both tables."""
    import copy

    move_cols: list[str] = []
    for pm in other.predicates:
        for cs in [*pm.columns, pm.graph_column]:
            if cs is not None and cs.physical:
                move_cols.append(cs.name)
        moved = copy.deepcopy(pm)
        # non-matched mc rows hold NULL in the moved physical columns;
        # reconstruction must not render the map's virtual constants for
        # them (a merged-in all-virtual-but-path IRI map would otherwise
        # fabricate scheme+host terms for every non-matched subject)
        moved.merged = True
        mc.predicates.append(moved)

    ok = subject_key(other).alias("__k")
    payload = other_df.select(ok, *move_cols)
    mk = subject_key(mc).alias("__k")
    merged = mc_df.withColumn("__k", subject_key(mc)).join(
        payload, "__k", "left"
    ).drop("__k")

    remaining = other_df.join(
        mc_df.select(mk).where(F.col("__k").isNotNull()),
        subject_key(other) == F.col("__k"),
        "left_anti",
    )
    return merged, remaining


def subject_key_range(df: DataFrame, table: TableSpec) -> tuple:
    """(min, max) of the subject key — one tiny agg job. Feeds the merge
    prefilter: disjoint key ranges can NEVER overlap, so the O(T^2)
    pairwise semi-join probes collapse to the pairs whose ranges touch
    (parquet min/max stats answer this scan cheaply)."""
    row = df.agg(
        F.min(subject_key(table)).alias("mn"), F.max(subject_key(table)).alias("mx")
    ).first()
    return row.mn, row.mx


def run_merges(
    spark: SparkSession,
    catalog: Catalog,
    frames: dict[str, DataFrame],
    sizes: dict[str, int],
) -> tuple[list[str], list[str]]:
    """The full TableMergingConcurence driver loop over in-memory (lazy)
    frames. Mutates ``catalog``/``frames``/``sizes``. Returns
    (names of tables that changed, names of emptied/dropped tables).

    Driver-loop scale: the per-table probes (repeating-subject, key range)
    are submitted from a bounded thread pool — serial submission would
    idle the executors between 10^4+ tiny jobs — and pairwise overlap
    probes only run for pairs whose subject-key [min,max] ranges intersect.
    """
    from ..pipeline import _pooled_map

    def order_key(t: TableSpec):
        return (0 if t.name.startswith("type_") else 1, sizes[t.name], t.name)

    tables = sorted(catalog.tables, key=order_key)

    def probe(t: TableSpec):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "stage_m")
        repeating = has_repeating_subjects(frames[t.name], t)
        rng = None if repeating else subject_key_range(frames[t.name], t)
        return t.name, repeating, rng

    probed = _pooled_map(probe, tables)
    repeating = {name: rep for name, rep, _ in probed}
    # ranges are used as SUPERSETS: merges only shrink `other`, so a stale
    # wider range is safe (costs an extra probe, never a missed overlap)
    ranges = {name: rng for name, _, rng in probed}
    candidates = [t for t in tables if not repeating[t.name]]
    merged_targets: set[str] = set()
    changed: set[str] = set()
    for mc in candidates:
        if sizes[mc.name] == 0:
            continue
        for other in list(candidates):
            if other.name == mc.name or not other.predicates:
                continue
            if other.subject_kind != mc.subject_kind:
                continue
            mc_preds = {pm.predicate for pm in mc.predicates}
            if any(pm.predicate in mc_preds for pm in other.predicates):
                continue
            if other.name in merged_targets or sizes[other.name] == 0:
                continue
            # nothing physical to pull in -> the reference's merge() is a
            # no-op for this pair (toMerge empty, :168-176); skip entirely.
            # Only OBJECT columns count: a lone physical graph column holds
            # no statement content (such tables exist here only because we
            # keep the last physical column where the reference empties the
            # table, IntroduceVirtualColumns.java:63-72).
            if not any(cs.physical for pm in other.predicates for cs in pm.columns):
                continue
            a, b = ranges[mc.name], ranges[other.name]
            if (
                a is not None
                and b is not None
                and a[0] is not None
                and b[0] is not None
                and (a[1] < b[0] or b[1] < a[0])
            ):
                continue  # disjoint key ranges: overlap impossible
            if not subjects_overlap(frames[mc.name], mc, frames[other.name], other):
                continue
            new_mc, new_other = merge_pair(frames[mc.name], mc, frames[other.name], other)
            # localCheckpoint keeps the cascade's plan from growing
            # unboundedly across merges (lineage cut, still lazy enough)
            frames[mc.name] = new_mc.localCheckpoint(eager=False)
            frames[other.name] = new_other.localCheckpoint(eager=False)
            sizes[other.name] = frames[other.name].count()
            changed.add(mc.name)
            changed.add(other.name)
        merged_targets.add(mc.name)

    dropped = []
    for t in list(catalog.tables):
        if sizes[t.name] == 0:
            catalog.tables.remove(t)
            frames.pop(t.name, None)
            dropped.append(t.name)
    return sorted(changed), dropped


def verify_subject_uniqueness(
    spark: SparkSession, catalog: Catalog, frames: dict[str, DataFrame]
) -> dict[str, bool]:
    """IntroduceIndexes analog (step 10, IntroduceIndexes.java:22-46): the
    reference tries CREATE UNIQUE INDEX over each table's subject columns
    and records whether it succeeded. Spark has no indexes (data skipping
    comes from parquet min/max stats), but the VERIFIED-UNIQUE bit is the
    part queries care about: it licenses merge candidacy and 1:1 join
    cardinality. Probes every table (bounded pool), records the boolean on
    the TableSpec (serialized with the catalog), returns {name: unique}."""
    from ..pipeline import _pooled_map

    def probe(t: TableSpec):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "stage_m")
        unique = not has_repeating_subjects(frames[t.name], t)
        t.subject_unique = unique
        return t.name, unique

    return dict(_pooled_map(probe, catalog.tables))
