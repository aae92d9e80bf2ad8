"""FK-closure engine: the set-at-a-time replacement for the reference's
recursive row-at-a-time core (``subsetter.py::Db.create_row_in`` and the
``Db.create_subset_in`` scheduler loop).

Reference semantics preserved:

* **Parent closure** (op #9): every selected row's non-null FK values
  must resolve to a selected parent row.  Reference: recursive
  ``create_row_in`` on each parent before inserting the child.  Here:
  key-set propagation child→parent in reverse topological order, one
  ``left_semi`` join per FK edge; FK cycles and self-referential tables
  iterate to a fixpoint with an anti-join against already-selected keys
  (the set equivalent of the reference's ``_exists`` base case that
  terminates its recursion).
* **Capped child pull** (op #10): after a row is selected, up to
  ``--children`` (default 3) referencing rows per child FK are pulled so
  subsets are "fleshed out".  Here: window top-k per parent key.
* **Existence/dedup** (op #8): ``_exists`` before insert → key sets are
  kept distinct and additions are anti-joined.
* **Policies** (op #13): full / exclude.  Excluded tables never receive
  keys — parent edges into them are not followed out of them either.

Scale notes (100 TB): only *key sets* flow between iterations (PK
columns, distinct — orders of magnitude smaller than rows); each
fixpoint iteration is one Spark job; key sets are ``localCheckpoint``-ed
per iteration to stop lineage growth (the real scale risk of iterative
Spark); the final materialization is one ``left_semi`` join per table,
which AQE turns into a broadcast join whenever the key set is small.
Above :data:`CLOSURE_MATERIALIZE_BYTES` of input the engine
additionally materializes each table's merged key set ONCE per closure
pass (lazy ``localCheckpoint`` + topological-wave forcing), so
downstream consumers — every FK edge of the integrity check, every
summary count branch — reuse one computed relation instead of
replaying the closure subtree per branch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

from rdbms_subsetter_spark.catalog import Catalog
from rdbms_subsetter_spark.constraints import ConstraintRegistry, ForeignKey
from rdbms_subsetter_spark.sampling import SamplePlan, sample_exact_n

#: Input-size threshold (bytes) above which the engine materializes
#: each table's merged key set once (lazy ``localCheckpoint`` + a
#: topological-wave forcing pass) instead of letting every downstream
#: branch replay the closure subtree.  The two shapes return identical
#: results; which is faster depends on scale:
#:
#: * BELOW the threshold (the sf0.1 bench and every test SF) the
#:   replayed-subtree plan wins: recompute is cheap, the branches run
#:   concurrently inside one job across all cores, and each
#:   materialization is a serializing driver action (~0.2 s fixed cost
#:   × ~16 key sets ≈ the whole query's runtime — measured r11: eager
#:   3.77→7.07 s, lazy →4.88 s; re-measured r12: lazy 4.6→8.6 s warm).
#: * ABOVE it the replay is the scale-killer the r11 verdict flagged:
#:   the flagship integrity plan executes ~139 parquet scans at
#:   runtime (232 statically; AQE exchange reuse dedups only the
#:   branches whose column pruning left them canonically identical),
#:   i.e. each table's closure subtree — sampling windows, semi-join
#:   chains — re-runs per FK edge.  Materializing each key set once
#:   makes that O(#tables + #edges) scans total, at the cost of the
#:   fixed per-action overhead that is noise at real scale.
#:
#: The crossover sits where one table scan costs about as much as a
#: driver action round-trip; 16 GiB total input is a conservative
#: floor for that on any real cluster.  Env-overridable for operators
#: (and for forcing the scale shape in tests/plan dumps).
CLOSURE_MATERIALIZE_BYTES = int(
    os.environ.get("SPARK_GRAFT_CLOSURE_CKPT_BYTES", str(16 << 30))
)


def _key_cols(registry: ConstraintRegistry, catalog: Catalog, table: str) -> list[str]:
    """PK columns, or all columns for no-PK tables (reference falls back
    to whole-row comparison in ``_exists``)."""
    pk = registry.pk(table)
    return list(pk) if pk else list(catalog.table(table).columns)


@dataclass
class SubsetResult:
    """Selected key sets + lazy row DataFrames for every table."""

    keys: dict[str, DataFrame]
    rows: dict[str, DataFrame] = field(default_factory=dict)

    def counts(self) -> dict[str, int]:
        return {t: df.count() for t, df in self.rows.items()}


class ClosureEngine:
    def __init__(
        self,
        catalog: Catalog,
        registry: ConstraintRegistry | None = None,
        materialize_keys: bool | None = None,
    ):
        """``materialize_keys``: materialize each table's merged key
        set once per closure pass instead of replaying its subtree per
        consumer branch.  Default ``None`` auto-selects by total input
        size (see :data:`CLOSURE_MATERIALIZE_BYTES`) — False at every
        test/bench SF, True at cluster scale."""
        self.catalog = catalog
        self.registry = registry or catalog.registry
        if materialize_keys is None:
            try:
                materialize_keys = (
                    catalog.total_input_bytes() > CLOSURE_MATERIALIZE_BYTES
                )
            except (OSError, AttributeError):
                # stat failure, or a catalog stub without file backing
                # (tests): replay shape — the conservative default
                materialize_keys = False
        self.materialize_keys = materialize_keys

    # ------------------------------------------------------------------
    def rows_for_keys(self, table: str, keys: DataFrame) -> DataFrame:
        """Materialize selected rows: one semi-join per table (AQE
        broadcasts the key side when small).

        No-PK tables use whole-row keys, so the keys ARE the rows:
        return them distinct — which both skips the semi-join and
        collapses duplicate source rows, mirroring the reference's
        whole-row ``_exists`` dedup for PK-less tables.
        """
        kc = list(keys.columns)
        table_cols = self.catalog.table(table).columns
        if set(kc) == set(table_cols):
            return keys.select(*table_cols).distinct()
        return self.catalog.table(table).join(keys, on=kc, how="left_semi")

    def _required_parent_keys(
        self, fk: ForeignKey, child_rows: DataFrame
    ) -> DataFrame:
        """Distinct non-null FK values of selected child rows, projected
        to the parent's key columns.  Handles FKs onto non-PK unique
        columns by resolving through the parent table."""
        refvals = (
            child_rows.select(
                *[F.col(c).alias(rc) for c, rc in zip(fk.columns, fk.ref_columns)]
            )
            .na.drop()
            .distinct()
        )
        parent_pk = _key_cols(self.registry, self.catalog, fk.ref_table)
        if tuple(fk.ref_columns) == tuple(parent_pk):
            return refvals
        # FK references a non-PK column: resolve to PK keys via the parent
        return (
            self.catalog.table(fk.ref_table)
            .join(refvals, on=list(fk.ref_columns), how="left_semi")
            .select(*parent_pk)
            .distinct()
        )

    # ------------------------------------------------------------------
    def close_parents(
        self,
        keys: dict[str, DataFrame],
        exclude: set[str] | None = None,
        max_iters: int = 50,
    ) -> dict[str, DataFrame]:
        """Propagate required keys child→parent until every FK of every
        selected row resolves (reference op #9, set-at-a-time).

        Acyclic tables get a purely declarative treatment: each table's
        final key set is built ONCE as ``distinct(existing ∪ all child
        contributions)`` in children-first SCC order, so the resulting
        plan is a shallow tree of semi-joins that Catalyst/AQE optimizes
        as one unit (broadcasts the small key sides, no driver-side
        iteration, no materialization).  Only genuine FK cycles (incl.
        self-refs) fall back to the fixpoint loop, where each iteration
        anti-joins against already-selected keys (the set equivalent of
        the reference's ``_exists`` recursion base case) and
        ``localCheckpoint``s to stop lineage growth.
        """
        exclude = exclude or set()
        keys = dict(keys)
        reg = self.registry
        # contributions to parent tables not yet processed
        pending: dict[str, list[DataFrame]] = {}
        # tables whose key set changed in THIS pass and was checkpointed
        # (materialize_keys mode only) — forced in topo waves at the end
        fresh: list[str] = []

        def merge(table: str) -> None:
            contribs = pending.pop(table, [])
            dfs = ([keys[table]] if table in keys else []) + contribs
            if not dfs:
                return
            merged = dfs[0]
            for d in dfs[1:]:
                merged = merged.unionByName(d)
            if len(dfs) > 1:
                merged = merged.distinct()
            if self.materialize_keys and contribs:
                # lazy: the wave-forcing pass below (or the first
                # consumer) materializes it; every later branch reuses
                # the persisted partitions instead of replaying this
                # table's whole closure subtree.  Only plans that
                # gained a contribution are new — an unchanged set
                # keeps its existing (possibly checkpointed) plan.
                merged = merged.localCheckpoint(eager=False)
                fresh.append(table)
            keys[table] = merged

        def emit(table: str, comp_set: set[str]) -> None:
            """Stash this table's parent-key requirements (outside its
            own component) for later merging."""
            rows = self.rows_for_keys(table, keys[table])
            for fk in reg.parents_of(table):
                if fk.ref_table in exclude or fk.ref_table in comp_set:
                    # excluded: reference op #13 [~] — parents pulled
                    # into excluded tables are not inserted
                    continue
                pending.setdefault(fk.ref_table, []).append(
                    self._required_parent_keys(fk, rows)
                )

        # sccs() is parents-first; requirements flow child→parent
        for comp in reversed(reg.sccs()):
            comp_set = set(comp)
            cyclic = len(comp) > 1 or any(
                fk.table == fk.ref_table == comp[0] for fk in reg.fks
            )
            for table in comp:
                if table not in exclude:
                    merge(table)
            if cyclic:
                for _ in range(max_iters):
                    grew = False
                    for table in comp:
                        if table not in keys or table in exclude:
                            continue
                        rows = self.rows_for_keys(table, keys[table])
                        for fk in reg.parents_of(table):
                            if fk.ref_table not in comp_set or fk.ref_table in exclude:
                                continue
                            needed = self._required_parent_keys(fk, rows)
                            if fk.ref_table in keys:
                                new = needed.join(
                                    keys[fk.ref_table],
                                    on=list(needed.columns),
                                    how="left_anti",
                                ).localCheckpoint(eager=True)
                                if new.count() == 0:
                                    continue
                                keys[fk.ref_table] = (
                                    keys[fk.ref_table]
                                    .unionByName(new)
                                    .distinct()
                                    .localCheckpoint(eager=True)
                                )
                            else:
                                keys[fk.ref_table] = needed.localCheckpoint(eager=True)
                            grew = True
                    if not grew:
                        break
            for table in comp:
                if table in keys and table not in exclude:
                    emit(table, comp_set)
        if fresh:
            self._force_in_waves(keys, fresh)
        return keys

    def _force_in_waves(self, keys: dict[str, DataFrame], fresh: list[str]) -> None:
        """Materialize lazily-checkpointed key sets in topological
        waves: consecutive tables with no FK between them share a wave
        whose ``count()`` actions run from a small thread pool, so
        their jobs overlap and back-fill each other's stragglers
        (guide §2.6) instead of paying one serialized driver action
        per table — the cost that sank the r11 eager-checkpoint
        attempt.  ``fresh`` is in children-first merge order, which is
        exactly dependency order for the contributions."""
        from concurrent.futures import ThreadPoolExecutor

        fks = self.registry.fks
        with ThreadPoolExecutor(max_workers=4) as pool:
            i = 0
            while i < len(fresh):
                wave = [fresh[i]]
                i += 1
                while i < len(fresh) and not any(
                    (fk.table in wave and fk.ref_table == fresh[i])
                    or (fk.ref_table in wave and fk.table == fresh[i])
                    for fk in fks
                ):
                    wave.append(fresh[i])
                    i += 1
                list(pool.map(lambda t: keys[t].count(), wave))

    # ------------------------------------------------------------------
    def incremental_delta(
        self,
        existing: dict[str, DataFrame],
        new_seed: dict[str, DataFrame],
        exclude: set[str] | None = None,
    ) -> dict[str, DataFrame]:
        """Incremental subset refresh (the CDC shape of the reference's
        job): given an already-CLOSED existing subset (key sets per
        table) and a new batch of seed keys, return the per-table DELTA
        key sets that must be added so that ``existing ∪ delta`` is
        closed again.  The reference would re-run `create_row_in` per
        new row with `_exists` skipping what the destination already
        has; set-at-a-time that is: close the new seed over the FK
        graph, then anti-join each table's closed keys against the
        existing keys.

        Scale shape: the closure runs ONLY on the new-seed key sets
        (delta-sized, not table-sized); the anti-joins are key-set vs
        key-set with the existing side as the build side.  Nothing in
        the existing subset is re-read beyond its key columns.
        """
        closed = self.close_parents(new_seed, exclude=exclude)
        delta: dict[str, DataFrame] = {}
        for t, k in closed.items():
            if t in existing:
                kc = list(k.columns)
                delta[t] = k.join(existing[t].select(*kc), on=kc, how="left_anti")
            else:
                delta[t] = k
        return delta

    def pull_children(

        self,
        keys: dict[str, DataFrame],
        k: int,
        edges: list[ForeignKey] | None = None,
        exclude: set[str] | None = None,
        seed: int | None = None,
    ) -> dict[str, DataFrame]:
        """Per-parent capped child pull (reference op #10).

        For each child FK whose parent has selected keys, pick up to
        ``k`` child rows per parent key: window ``row_number() <= k``
        partitioned by the FK columns.  Deterministic order by the
        child PK by default (oracle-expressible); pass ``seed`` for the
        reference's random flavor (``ORDER BY random()``), still
        reproducible via the seed.
        """
        exclude = exclude or set()
        keys = dict(keys)
        reg = self.registry
        edges = edges if edges is not None else list(reg.fks)
        for fk in edges:
            if fk.ref_table not in keys or fk.table in exclude:
                continue
            child = self.catalog.table(fk.table)
            parent_rows = self.rows_for_keys(fk.ref_table, keys[fk.ref_table])
            parent_refvals = (
                parent_rows.select(
                    *[F.col(rc).alias(c) for c, rc in zip(fk.columns, fk.ref_columns)]
                ).distinct()
            )
            candidates = child.join(parent_refvals, on=list(fk.columns), how="left_semi")
            child_pk = _key_cols(reg, self.catalog, fk.table)
            order = [F.rand(seed), *child_pk] if seed is not None else list(child_pk)
            w = Window.partitionBy(*fk.columns).orderBy(*order)
            picked = (
                candidates.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= k)
                .select(*child_pk)
            )
            if fk.table in keys:
                keys[fk.table] = keys[fk.table].unionByName(picked).distinct()
            else:
                keys[fk.table] = picked
            if self.materialize_keys:
                # the window top-k subtree is the most expensive key
                # plan in the pipeline; at scale it must run once, not
                # once per downstream FK edge/count branch.  Lazy: the
                # re-close's emit() is the first consumer.
                keys[fk.table] = keys[fk.table].localCheckpoint(eager=False)
        return keys

    # ------------------------------------------------------------------
    def integrity_violations_df(self, rows: dict[str, DataFrame]) -> DataFrame:
        """Anti-join check per FK edge: count of child rows whose
        non-null FK values do NOT resolve to a selected parent row.
        All-zero == referential integrity (the reference's core test
        invariant, SURVEY.md §5a).  One lazy union plan — a single
        Spark job for all edges, not a count() per edge."""
        parts = []
        for fk in sorted(
            self.registry.fks, key=lambda f: (f.table, f.columns, f.ref_table)
        ):
            if fk.table not in rows or fk.ref_table not in rows:
                continue
            edge = f"{fk.table}({','.join(fk.columns)})->{fk.ref_table}"
            child_fkvals = rows[fk.table].select(
                *[F.col(c).alias(rc) for c, rc in zip(fk.columns, fk.ref_columns)]
            ).na.drop()
            missing = child_fkvals.join(
                rows[fk.ref_table].select(*fk.ref_columns),
                on=list(fk.ref_columns),
                how="left_anti",
            )
            parts.append(
                missing.agg(F.count(F.lit(1)).alias("violations")).select(
                    F.lit(edge).alias("fk_edge"), "violations"
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def integrity_violations(self, rows: dict[str, DataFrame]) -> dict[str, int]:
        """Dict form of :meth:`integrity_violations_df` (one job)."""
        return {
            r["fk_edge"]: r["violations"]
            for r in self.integrity_violations_df(rows).collect()
        }

    # ------------------------------------------------------------------
    def create_subset(
        self,
        plan: SamplePlan,
        seeds: dict[str, DataFrame] | None = None,
        child_pull_edges: list[ForeignKey] | None = None,
        child_pull_rounds: int = 1,
    ) -> SubsetResult:
        """Full pipeline (reference ``Db.create_subset_in``), set-at-a-time:

        1. seed every non-excluded table toward its size target
           (+ forced/explicit seed keys),
        2. close parents (fixpoint),
        3. capped child pull,
        4. re-close parents of the newly pulled rows,
        repeat 3-4 ``child_pull_rounds`` times.

        The reference's priority scheduler (``_completeness_score`` /
        ``_next_row``) is a row-at-a-time artifact and disappears; the
        deterministic pass ordering above is its replacement.
        """
        exclude = set(plan.exclude_tables)
        keys: dict[str, DataFrame] = {}
        for table in self.catalog.tables():
            if table in exclude:
                continue
            pol = plan.policy_for(table)
            df = self.catalog.table(table)
            n = pol.target(self.catalog.count_estimate(table))
            kc = _key_cols(self.registry, self.catalog, table)
            if pol.mode == "full":
                keys[table] = df.select(*kc)
            elif n > 0:
                keys[table] = sample_exact_n(df, n, plan.seed, tuple(kc)).select(*kc)
        if seeds:
            for table, seed_keys in seeds.items():
                kc = _key_cols(self.registry, self.catalog, table)
                sk = seed_keys.select(*kc)
                keys[table] = keys[table].unionByName(sk).distinct() if table in keys else sk

        keys = self.close_parents(keys, exclude=exclude)
        for _ in range(child_pull_rounds):
            keys = self.pull_children(
                keys, plan.children, edges=child_pull_edges, exclude=exclude,
                seed=None,
            )
            keys = self.close_parents(keys, exclude=exclude)

        rows = {t: self.rows_for_keys(t, k) for t, k in keys.items()}
        return SubsetResult(keys=keys, rows=rows)
