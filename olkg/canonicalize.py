"""Canonicalize stage: dedup (A4) + identifier-blocked entity resolution.

The reference never deduplicates its output (the same ISBN arriving via both
``isbn_10`` and ``isbn_13`` emits duplicate statements) — the comparison set
is the *deduplicated* (s,p,o) set (SURVEY.md §2.7 A4), so dedup is the first
step here.

Entity canonicalization (north_star): editions/works that denote the same
entity are clustered by **blocking keys** —

- normalized ISBN-13 (``bibo:isbn13``), LCCN (``bibo:lccn``),
  OCLC (``bibo:oclcnum``): exact identifier blocks;
- author name MinHash band signatures: fuzzy name blocks.

Within the bipartite (entity, block-key) graph, connected components are
computed by hash-min label propagation — alternating min-aggregations over the
two sides until a fixpoint.  Blocks are tiny after blocking, so convergence is
fast (diameter of the identifier co-occurrence graph), and every iteration is
two shuffles on (key) / (entity) — no driver-side state, no GraphFrames
dependency.  The canonical id of a cluster is its lexicographically smallest
member URI (deterministic across runs and cluster sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import vocab as V


_EDGE_COLS = ["subj", "pred", "obj", "obj_kind", "obj_datatype"]


# Measured on this host (BENCH/BASELINE.md): map-side partial aggregation
# beats prepartition below ~1-2M mostly-unique rows per map task and loses
# 3x above it.  'auto' flips at the midpoint and sizes reduce partitions to
# ~1M rows each.
AUTO_PREPARTITION_ROWS_PER_TASK = 1_500_000
AUTO_TARGET_ROWS_PER_PARTITION = 1_000_000


def plan_dedup(total_rows: int, rows_per_task: float) -> tuple[str, int | None]:
    """Pure sizing rule for :func:`dedup_edges` strategy='auto': returns
    (strategy, num_partitions).  Separated from the Spark sampler so the
    decision boundary is unit-testable with arbitrary scales."""
    if rows_per_task > AUTO_PREPARTITION_ROWS_PER_TASK:
        n = max(1, round(total_rows / AUTO_TARGET_ROWS_PER_PARTITION))
        return "prepartition", n
    return "partial", None


def dedup_edges(triples: DataFrame, strategy: str = "partial",
                num_partitions: int | None = None,
                est_total_rows: int | None = None,
                est_rows_per_task: float | None = None) -> DataFrame:
    """A4: distinct (subj, pred, obj, obj_kind, obj_datatype).

    strategy='partial' (default): plain dropDuplicates — hash aggregate with
    map-side partial dedup.  Right when per-map-task row counts fit the hash
    map or duplicates are common.

    strategy='prepartition': explicit repartition on the dedup key first, so
    Catalyst plans ONE complete aggregate and skips the map-side partial
    pass.  Web-scale triple streams are mostly UNIQUE rows — partial
    aggregation then reduces nothing while building (and spilling) a giant
    per-task hash map.  Measured on 2.4M pages / 57M rows at 8 cores:
    300 s (partial) → 111 s (prepartition, ≈ the no-dedup write cost).

    strategy='auto': pick by data size via :func:`plan_dedup` from the
    caller-supplied estimates (``est_total_rows``, ``est_rows_per_task`` —
    see olkg.pipeline.estimate_extract_size for the cheap sampler).  With
    no estimates, 'auto' degrades to 'partial' (the small-corpus default)."""
    if strategy == "auto":
        if est_rows_per_task is not None:
            strategy, auto_n = plan_dedup(est_total_rows or 0,
                                          est_rows_per_task)
            if num_partitions is None:
                num_partitions = auto_n
        else:
            strategy = "partial"
    if strategy == "prepartition":
        pre = (triples.repartition(num_partitions, *_EDGE_COLS)
               if num_partitions else triples.repartition(*_EDGE_COLS))
        return pre.dropDuplicates(_EDGE_COLS)
    return triples.dropDuplicates(_EDGE_COLS)


def with_dedup_write_cols(stream: DataFrame) -> DataFrame:
    """Annotate an extract stream for write-then-dedup (:func:`dedup_from_raw`):

    - ``h1``/``h2``: two independent 64-bit row hashes (seeds 0 / 42) over the
      five edge columns — a 128-bit row identity.  Multi-arg ``xxhash64`` is
      ambiguity-free here because only the TRAILING column (obj_datatype) is
      nullable, so the null-fold property of Spark's hash (a null argument
      leaves the seed untouched) cannot make two distinct rows collide by
      null-position shifting.
    - ``uid``: a unique row id (``monotonically_increasing_id``), computed
      once inside the write's projection so it is durable — downstream jobs
      never depend on re-deriving ids from a re-planned scan.

    All three are JVM-side codegen expressions added to the write projection;
    the Python extraction stage stays a pure narrow map."""
    return stream.select(
        "*",
        F.xxhash64(*_EDGE_COLS).alias("h1"),
        F.xxhash64(F.lit(42), *_EDGE_COLS).alias("h2"),
        F.monotonically_increasing_id().alias("uid"))


def dedup_from_raw(raw: DataFrame,
                   max_broadcast_drops: int = 20_000_000,
                   stats: dict | None = None,
                   detect: str = "hashagg",
                   detect_partitions: int | None = None,
                   cleanup: list | None = None) -> DataFrame:
    """A4 dedup as a SEPARATE job over a materialized raw edge table (written
    with :func:`with_dedup_write_cols` columns) — the decoupled alternative to
    deduplicating inline in the extraction stage.

    Why decouple: fused extract+dedup couples the Python-bound map stage to
    a full shuffle of the (mostly unique) triple stream in one stage pair —
    measured at 2.4M pages, that coupling is what capped the stage's
    parallel scaling (BENCH/BASELINE.md, round 3).  Decoupled, the extract
    stage is a pure narrow map+write (scales with cores), and dedup becomes
    this job, which never shuffles the full rows at all on the broadcast
    plan.

    DETECT formulations (``detect=``), both scanning only the three long
    columns (h1, h2, uid — columnar pruning, no string decode):

    - ``'hashagg'`` (default): explicit repartition on (h1, h2) then ONE
      complete hash aggregate — groupBy(h1, h2) → (min uid, count) — kept
      only where count > 1.  The repartition-first shape skips the map-side
      partial pass, which on a mostly-UNIQUE key stream reduces nothing
      while building a giant per-task hash map (the dedup_edges
      'prepartition' lesson, 3x measured), and a hash aggregate never sorts
      — the phase probe showed the sort-based window detect is
      spill-sensitive at low parallelism (anti-scaled in one 2.4M trial).
      The dup-GROUP table (one 24-byte row per duplicated hash group,
      regardless of group size) is the only detect output.
    - ``'window'``: min/count window over (h1, h2) → per-row keep marks —
      one narrow shuffle plus a per-partition SORT of the projection; the
      round-4 formulation, kept for A/B measurement.

    REMOVE: when the detected duplicate volume fits ``max_broadcast_drops``
    the small side is BROADCAST and the full rows move ZERO times —
    'hashagg' joins the group table back on (h1, h2) keeping rows with no
    group entry or uid == min (so it never materializes a per-row drop
    set at all); 'window' anti-joins the drop set on uid.  Beyond the
    broadcast bound the join shuffles (SHUFFLE_HASH — volume equivalent to
    the fused plan's shuffle; at that scale a real cluster's aggregate
    shuffle bandwidth is the resource that grows with node count, so the
    full shuffle is the right plan there anyway).

    Exactness rests on the 128-bit row identity: two distinct rows dropped
    as duplicates require an (h1, h2) double collision, P ≈ n²/2¹²⁹
    (~1e-15 at 10¹² rows).  ``stats`` (optional dict) records the drop
    count and the chosen plan — no silent behavior switches.  ``cleanup``
    (a list, effectively REQUIRED): the detect intermediate is persisted
    and appended here for the caller to unpersist once the output is
    materialized (it must outlive the returned plan's execution, so this
    function cannot unpersist it itself).  Omitting ``cleanup`` leaks that
    executor cache for the app lifetime — a ResourceWarning says so rather
    than leaking silently."""
    if cleanup is None:
        # UserWarning + a WARNING-level log line: ResourceWarning is hidden
        # by default Python filters, which made the documented "fail loudly
        # instead of leaking silently" contract effectively silent
        import logging
        import warnings
        msg = ("dedup_from_raw: no `cleanup` list passed — the persisted "
               "detect intermediate cannot be unpersisted by the caller and "
               "leaks for the app lifetime; pass cleanup=[] and unpersist "
               "its entries after materializing the output")
        warnings.warn(msg, UserWarning, stacklevel=2)
        logging.getLogger(__name__).warning(msg)
    proj = raw.select("h1", "h2", "uid")
    if detect == "hashagg":
        pre = (proj.repartition(detect_partitions, "h1", "h2")
               if detect_partitions else proj.repartition("h1", "h2"))
        groups = (pre.groupBy("h1", "h2")
                  .agg(F.min("uid").alias("_keep"),
                       F.count(F.lit(1)).alias("_n"))
                  .filter(F.col("_n") > 1)
                  .persist())
        if cleanup is not None:
            cleanup.append(groups)
        census = groups.agg(
            F.count(F.lit(1)).alias("g"),
            F.sum(F.col("_n") - F.lit(1)).alias("d")).first()
        n_groups, n_drops = census["g"] or 0, census["d"] or 0
        small = n_drops <= max_broadcast_drops
        right = groups.select("h1", "h2", "_keep")
        if small:
            joined = raw.join(F.broadcast(right), ["h1", "h2"], "left")
        else:
            joined = raw.join(right.hint("SHUFFLE_HASH"),
                              ["h1", "h2"], "left")
        out = (joined
               .filter(F.col("_keep").isNull()
                       | (F.col("uid") == F.col("_keep")))
               .select(*_EDGE_COLS))
        if stats is not None:
            stats["n_dup_groups"] = n_groups
            stats["n_dropped_dups"] = n_drops
            stats["dedup_plan"] = ("hashagg-broadcast" if small
                                   else "hashagg-shuffle")
        return out
    if detect != "window":
        raise ValueError(f"unknown detect formulation: {detect!r}")
    w = Window.partitionBy("h1", "h2")
    drops = (proj
             .withColumn("_keep", F.min("uid").over(w))
             .withColumn("_n", F.count(F.lit(1)).over(w))
             .filter((F.col("_n") > 1) & (F.col("uid") != F.col("_keep")))
             .select("uid")
             .persist())
    if cleanup is not None:
        cleanup.append(drops)
    n_drops = drops.count()
    small = n_drops <= max_broadcast_drops
    right = F.broadcast(drops) if small else drops
    out = raw.join(right, "uid", "left_anti").select(*_EDGE_COLS)
    if stats is not None:
        stats["n_dropped_dups"] = n_drops
        stats["dedup_plan"] = ("hashdrop-broadcast" if small
                               else "hashdrop-shuffle")
    return out


_ID_PREDS = {
    V.BIBO_ISBN13: "isbn13",
    V.BIBO_LCCN: "lccn",
    V.BIBO_OCLCNUM: "oclc",
}


def blocking_keys(edges: DataFrame, author_names: DataFrame | None = None,
                  minhash_bands: int = 4, band_rows: int = 2) -> DataFrame:
    """(entity, block_key) pairs.

    Identifier keys come straight off the deduped edge table (already
    normalized by the extract semantics: ISBN cleanup/convert, LCCN strip,
    OCLC digits-only).  Author fuzzy keys are MinHash band signatures over
    character 3-grams of each name (vectorized, see _minhash_band_udf)."""
    pred_map = F.create_map(*[F.lit(x) for kv in _ID_PREDS.items() for x in kv])
    ids = (edges.filter(F.col("pred").isin(list(_ID_PREDS)))
           .select(F.col("subj").alias("entity"),
                   F.concat_ws(":", pred_map[F.col("pred")],
                               F.col("obj")).alias("block_key")))
    if author_names is None:
        return ids
    bands = _author_name_bands(author_names, minhash_bands, band_rows)
    return ids.unionByName(bands)


def _author_name_bands(author_names: DataFrame, num_bands: int,
                       band_rows: int) -> DataFrame:
    """MinHash-LSH band keys for author names, entirely in native
    expressions (JVM-side, codegen): casefold+strip → char-3-gram array →
    per-permutation min of xxhash64(perm|gram) → per-band signature hash.
    Two names sharing any band land in one block."""
    n_perm = num_bands * band_rows
    per_author = (author_names
                  .select(F.col("author_key"), F.col("name"))
                  .dropDuplicates())
    # web corpora repeat the same name across vast numbers of pages/clones:
    # compute the MinHash signature once per DISTINCT name string, then map
    # back to author keys — the gram fan-out runs on |distinct names|, not
    # |author mentions|
    distinct_names = per_author.select("name").distinct()
    norm = F.lower(F.regexp_replace(F.col("name"), r"[^A-Za-z0-9]", ""))
    n_grams = F.greatest(F.length(norm) - F.lit(2), F.lit(1))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: norm.substr(i, F.lit(3))))
    # hash each gram ONCE; the p-th permutation hash is a cheap remix
    # xxhash64(gram_hash, p) computed as p aggregate columns — one shuffle of
    # the gram rows, no p-fold explosion before the min
    with_grams = (distinct_names.select(
        "name",
        F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .select("name", F.xxhash64("gram").alias("h")))
    mins = with_grams.groupBy("name").agg(
        *[F.min(F.xxhash64(F.col("h"), F.lit(p))).alias(f"m{p}")
          for p in range(n_perm)])
    band_keys = F.array(*[
        F.concat(F.lit(f"nameband:{b}:"),
                 F.xxhash64(*[F.col(f"m{b * band_rows + r}")
                              for r in range(band_rows)]).cast("string"))
        for b in range(num_bands)])
    name_bands = mins.select("name", F.explode(band_keys).alias("block_key"))
    return (per_author.join(name_bands, "name")
            .select(F.concat(F.lit(V.URI_PREFIX),
                             F.col("author_key")).alias("entity"),
                    "block_key")
            .dropDuplicates())


def connected_components(pairs: DataFrame, max_iter: int = 20,
                         truncate_every: int = 5,
                         reliable_dir: str | None = None,
                         max_block_df: int | None = 100_000,
                         dropped_stats: dict | None = None,
                         cc_stats: dict | None = None) -> DataFrame:
    """Hash-min label propagation over the bipartite (entity, block_key)
    graph.  Returns (entity, canonical_id) for every entity that has at least
    one *merge-capable* block key (df >= 2); singleton-key entities are their
    own canonical id and are omitted (identity).  canonical_id is the
    lexicographic MIN entity URI of the component (restored after the loop,
    so it is independent of the loop's internal label encoding).

    Scale shape (round 5; the 2.4M-page gate showed this stage dominating):

    - the loop state is 128-BIT HASH-ENCODED: entities and block keys become
      (xxhash64(x), xxhash64(7, x)) structs once, so every iteration sorts
      and shuffles 16-byte fixed-width labels instead of URI strings (~5x
      less payload at web scale; false-merge P ~ n^2/2^128 ~ 1e-15 at 10^12
      entities, the same stated bound as dedup_from_raw's row digest);
    - each iteration is TWO key-partitioned window aggregations -- min-over-
      block then min-over-entity -- with the changed-row census piggybacked
      via ``observe`` on the SAME action (no separate convergence job);
    - the graph is CONTRACTED once the census shows most rows stable (and
      unconditionally after iteration 0, which computes the 2-hop min and
      therefore already clusters): one row per (label, block) with
      each current label becoming a pseudo-entity, then blocks with < 2
      distinct pseudo-entities are dropped -- a fully-internal block can
      never merge anything again, so late iterations touch only the
      unresolved frontier (the gate corpus collapses 17M rows to the chain
      joints).  Final labels unwind through the recorded (entity -> label)
      mappings, outermost last;
    - a POINTER-JUMP step (label <- label-of-label, one self-join) engages
      on a roughly-flat census -- the signature of chain-at-a-time
      propagation -- and compresses chains in O(log diameter) rounds; star
      blocks collapse geometrically and never pay it.  Past ``max_iter//2``
      it engages unconditionally as a convergence backstop.

    Lineage is truncated every ``truncate_every`` iterations AFTER the
    census materializes (every iteration is observed; an unobserved
    iteration can never read as converged): reliable ``checkpoint`` into
    ``reliable_dir`` when given (the durable path -- an executor loss on a
    real cluster recovers from distributed storage), else
    ``localCheckpoint`` (fast path; re-derivable state).

    ``cc_stats`` (dict, optional) receives: iterations, jump_engaged_at,
    changed_hist, iter_walls (per-iteration seconds), contractions
    (at_iter / rows_before / rows_after censuses -- no silent shrinks).
    """
    import time as _time
    from pyspark.sql import Observation

    spark = pairs.sparkSession

    def _h(col: str):
        return F.struct(F.xxhash64(F.col(col)).alias("h1"),
                        F.xxhash64(F.lit(7), F.col(col)).alias("h2"))

    enc = pairs.select(_h("entity").alias("eh"), _h("block_key").alias("bh"),
                       F.col("entity"))
    pe = enc.select("eh", "bh").dropDuplicates(["eh", "bh"])
    # entity-string dictionary: only read AFTER convergence to restore the
    # min-URI representative; min() makes a (2^-128) hash collision
    # deterministic rather than racy
    ent_names = (enc.groupBy("eh").agg(F.min("entity").alias("entity"))
                 .persist())

    # only keys shared by >=2 entities can merge anything -- this drops the
    # (at web scale, vast) unique-identifier majority before the loop;
    # SHUFFLE_HASH: AQE would otherwise broadcast the large side per plan.
    # max_block_df additionally drops SUPER-BLOCKS (df > cap): a blocking
    # key shared by 100k+ entities -- a hub author name, a placeholder ISBN,
    # a degenerate band bucket -- carries no discriminating evidence, chains
    # unrelated entities into one giant component, and blows up both the
    # window sizes and the iteration count (component diameter).  This is
    # the standard entity-resolution guard; pass ``dropped_stats`` (a dict)
    # to census what the cap discarded (no silent caps).
    dfs = (pe.groupBy("bh").agg(F.count(F.lit(1)).alias("df"))
           .persist())  # census + mergeable filter share one computation
    keep = F.col("df") >= 2
    if max_block_df is not None:
        keep = keep & (F.col("df") <= max_block_df)
        if dropped_stats is not None:
            row = (dfs.filter(F.col("df") > max_block_df)
                   .agg(F.count(F.lit(1)).alias("k"),
                        F.sum("df").alias("rows")).first())
            dropped_stats["dropped_super_blocks"] = row["k"] or 0
            dropped_stats["dropped_pair_rows"] = row["rows"] or 0
    mergeable = dfs.filter(keep).select("bh")
    state = (pe.join(mergeable.hint("SHUFFLE_HASH"), "bh")
             .withColumn("label", F.col("eh"))
             .persist())
    n_rows = state.count()
    dfs.unpersist()
    if reliable_dir is not None:
        spark.sparkContext.setCheckpointDir(reliable_dir)

    wk = Window.partitionBy("bh")
    we = Window.partitionBy("eh")
    changed_hist: list[int] = []
    iter_walls: list[float] = []
    contractions: list[dict] = []
    maps: list[DataFrame] = []   # contraction mappings, outermost first
    jump_on = False
    jump_engaged_at: int | None = None
    last_contract = -2
    for i in range(max_iter):
        t_iter = _time.time()
        # min(label) over the block, then min of that over the entity; both
        # include the row's own label, so labels decrease monotonically
        obs = Observation(f"cc_changed_{i}")
        win = (state
               .withColumn("_kmin", F.min("label").over(wk))
               .withColumn("_new", F.min("_kmin").over(we))
               .select("eh", "bh",
                       F.col("_new").alias("label"),
                       (~(F.col("_new") == F.col("label"))).cast("int")
                       .alias("_chg")))
        if not jump_on and i >= 2:
            # engage the jump only when the changed census is NOT collapsing
            # geometrically (see docstring): flat counts mean chains, which
            # need O(log d) jumping; a >=4x per-round drop means stars about
            # to hit 0, for which the jump is pure overhead.
            prev, prev2 = changed_hist[-1], changed_hist[-2]
            jump_on = prev > 0 and (prev * 4 > prev2 or i >= max_iter // 2)
            if jump_on:
                jump_engaged_at = i
        if jump_on:
            # pointer jump: label <- label(label).  Labels are entity ids,
            # so the per-entity label map applied to the label column
            # halves every chain.  `win` is persisted because the jump
            # reads it twice (left side + the map); the census moves to the
            # post-join projection (a stable window step implies a stable
            # jump, so observing window-step changes remains a sound
            # convergence test).
            win = win.persist()
            jmp = (win.select(F.col("eh").alias("label"),
                              F.col("label").alias("_jmp"))
                   .dropDuplicates(["label"]))
            nxt = (win.join(jmp, "label", "left")
                   .select("eh", "bh",
                           F.coalesce("_jmp", "label").alias("label"),
                           "_chg"))
        else:
            nxt = win
            win = None
        new_state = (nxt.observe(obs, F.sum("_chg").alias("n"))
                     .drop("_chg"))
        new_state = new_state.persist()
        n_rows = new_state.count()
        state.unpersist()
        if win is not None:
            win.unpersist()
        state = new_state
        raw = obs.get["n"]
        n_changed = int(raw) if raw is not None else 0   # always observed now
        changed_hist.append(n_changed)
        # truncate AFTER the census materialized: the observation fired on
        # the persisted node above, so truncation reads the cache once and
        # never masks the census (the old order lost one census per
        # truncation and burned a full extra iteration on the carried count)
        if (i + 1) % truncate_every == 0 and n_changed and n_rows:
            t = (state.checkpoint(eager=True) if reliable_dir is not None
                 else state.localCheckpoint(eager=True))
            state.unpersist()
            state = t
        if n_changed == 0 or n_rows == 0:
            iter_walls.append(round(_time.time() - t_iter, 2))
            break
        # -- contraction: unconditional after iteration 0 (which already
        # computed the 2-hop min, so clusters exist to contract), then
        # whenever most rows are stable; bounded at 4 levels (each costs
        # ~1 cheap pass and shrinks every later iteration, so it always
        # pays back on big graphs and costs epsilon on small ones --
        # tests run through it too).  Star-only graphs contract to an
        # EMPTY frontier here and exit after a single full-size pass.
        if (len(maps) < 4 and i - last_contract >= 2
                and (i == 0 or n_changed * 2 < n_rows)):
            mapping = state.select("eh", "label").distinct().persist()
            mapping.count()   # pin before the state it derives from moves
            if reliable_dir is not None:
                # rebind to the checkpoint and release the pre-checkpoint
                # cache NOW — the final unwind only unpersists the handle it
                # kept, so leaving the old copy persisted would leak it for
                # the app lifetime
                ckpt = mapping.checkpoint(eager=True)
                mapping.unpersist()
                mapping = ckpt
            cstate = state.select(F.col("label").alias("eh"), "bh").distinct()
            cdfs = cstate.groupBy("bh").agg(F.count(F.lit(1)).alias("df"))
            cstate = (cstate.join(cdfs.filter(F.col("df") >= 2).select("bh")
                                  .hint("SHUFFLE_HASH"), "bh")
                      .select("bh", "eh", F.col("eh").alias("label"))
                      .persist())
            c_rows = cstate.count()
            contractions.append({"at_iter": i, "rows_before": n_rows,
                                 "rows_after": c_rows})
            maps.append(mapping)
            state.unpersist()
            state = cstate
            n_rows = c_rows
            last_contract = i
        iter_walls.append(round(_time.time() - t_iter, 2))
        if n_rows == 0:
            break
    converged = (not changed_hist or changed_hist[-1] == 0 or n_rows == 0)
    if cc_stats is not None:
        cc_stats["iterations"] = len(changed_hist)
        cc_stats["jump_engaged_at"] = jump_engaged_at
        cc_stats["changed_hist"] = changed_hist
        cc_stats["iter_walls"] = iter_walls
        cc_stats["contractions"] = contractions
        cc_stats["converged"] = converged
    if not converged:
        # fail LOUDLY rather than return a partially-merged map: max_iter
        # exhausted with rows still changing means the output would silently
        # under-merge (the engine's no-silent-caps rule).  Unreachable with
        # the default budget — the pointer-jump backstop bounds convergence
        # at O(log diameter) — so hitting this means the budget was cut or
        # the graph violates the blocking assumptions; both deserve a stop.
        state.unpersist()
        for mapping in maps:
            mapping.unpersist()
        ent_names.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations: {changed_hist[-1]} rows still changing over a "
            f"{n_rows}-row frontier (changed_hist={changed_hist}); raise "
            f"max_iter or inspect the blocking keys for super-components")
    # unwind: pseudo-entity labels -> previous level's labels, innermost
    # mapping first; a pseudo-entity absent from the contracted loop output
    # was removed by the df>=2 refilter with its component fully converged,
    # so its label is final (coalesce keeps it)
    comp = state.select("eh", "label").distinct()
    for mapping in reversed(maps):
        m = mapping.withColumnRenamed("label", "_plabel")
        c = (comp.withColumnRenamed("eh", "_pe")
             .withColumnRenamed("label", "_flabel"))
        comp = (m.join(c, m["_plabel"] == c["_pe"], "left")
                .select("eh",
                        F.coalesce("_flabel", "_plabel").alias("label")))
    comp = comp.join(ent_names, "eh").select("entity", "label")
    # representative = min entity URI per component, exactly as the string-
    # label loop chose it (labels are internal ids only); ONE window pass
    # instead of groupBy + join-back — the rows are already co-partitioned
    # by label for the min, so the join-back shuffle would be pure waste
    out = (comp.withColumn("canonical_id",
                           F.min("entity").over(Window.partitionBy("label")))
           .select("entity", "canonical_id").distinct())
    # pin the result before releasing the loop caches it derives from
    out = out.localCheckpoint(eager=True)
    state.unpersist()
    for mapping in maps:
        mapping.unpersist()
    ent_names.unpersist()
    return out


def canonical_map_from_blocks(block_ids: DataFrame,
                              author_names: DataFrame | None = None,
                              reliable_dir: str | None = None,
                              minhash_bands: int = 4,
                              band_rows: int = 2,
                              max_block_df: int | None = 100_000,
                              dropped_stats: dict | None = None,
                              cc_stats: dict | None = None) -> DataFrame:
    """canonical_map from pre-extracted (entity, block_key) rows — the fast
    path feeds the extract stage's sink copy of the identifier triples here,
    so entity resolution never re-scans the full edge table (and can run
    concurrently with the link stage, which only appends join-born
    predicates that are never blocking keys)."""
    pairs = block_ids.select("entity", "block_key")
    if author_names is not None:
        pairs = pairs.unionByName(
            _author_name_bands(author_names, minhash_bands, band_rows))
    return connected_components(pairs, reliable_dir=reliable_dir,
                                max_block_df=max_block_df,
                                dropped_stats=dropped_stats,
                                cc_stats=cc_stats)


def canonical_map(edges: DataFrame, author_names: DataFrame | None = None,
                  reliable_dir: str | None = None,
                  max_block_df: int | None = 100_000,
                  dropped_stats: dict | None = None,
                  cc_stats: dict | None = None) -> DataFrame:
    """(entity, canonical_id) for all entities resolvable via blocking keys;
    entities not in any block are their own canonical id (left out of the map
    — consumers treat absence as identity).  ``reliable_dir``: durable CC
    checkpoint location (cluster-side distributed storage) for the resumable
    path."""
    return connected_components(blocking_keys(edges, author_names),
                                reliable_dir=reliable_dir,
                                max_block_df=max_block_df,
                                dropped_stats=dropped_stats,
                                cc_stats=cc_stats)


def sameas_edges_from_map(cmap: DataFrame) -> DataFrame:
    """owl:sameAs edges materializing non-trivial cluster memberships."""
    return (cmap.filter(F.col("entity") != F.col("canonical_id"))
            .select(F.col("entity").alias("subj"),
                    F.lit(V.OWL_SAME_AS).alias("pred"),
                    F.col("canonical_id").alias("obj"),
                    F.lit("uri").alias("obj_kind"),
                    F.lit(None).cast("string").alias("obj_datatype")))
