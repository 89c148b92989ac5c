"""Persistent ANN indexes — train once, probe for weeks (VERDICT r9
item 5).

The live ANN operators (operators/similarity.py) train their model
(IVF centroids + list assignment, PQ codebooks + codes) inside the
query: right for one-shot jobs, wrong for a production retrieval
pipeline where a 100 TB corpus is indexed ONCE and then probed by weeks
of query batches. This module persists the trained artifacts and
reloads them in later sessions:

- **manifest** — the tiny model state (centroids / codebooks, column
  names, params) committed through ``sources/statefs``: the same
  versioned write-once protocol as the persistent dedup state, so the
  index can live on any HCFS scheme (hdfs://, s3a://, viewfs://) and a
  crash mid-build never leaves a readable-but-wrong index (the data
  files land first; the manifest commit is the publish point).
- **lists/** (IVF) — the assigned corpus (neighbor_id, _emb, list_id)
  as parquet PARTITIONED BY list_id: a probe routes its queries to
  n_probe lists and reads ONLY those directories (the probe collects
  the routed list ids — bounded by n_lists — and filters, so partition
  pruning is static and visible in the scan, not dependent on runtime
  DPP support).
- **codes/** (PQ) — the encoded corpus (neighbor_id, codes), 32x
  smaller than raw float; **corpus/** — the raw embeddings for the
  exact rerank stage (optional; skip when a separate store serves it).

Probe plans stay Exchange-free on the corpus side: routed queries are
broadcast against the list scan exactly as in the live operators.

Reference parity: the reference engine has no ANN or model persistence
(SURVEY.md §2 extensions) — this is LLM-pipeline extension surface,
shaped after the dedup state store's deployment contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from codd_spark.sources.statefs import resolve_statefs


class PersistentANNIndex:
    """A trained ANN index on durable storage. Build with
    :meth:`build_ivf` / :meth:`build_pq`; reload with :meth:`open`;
    search with :meth:`top_k`."""

    def __init__(self, spark, state_dir: str, fs, manifest: dict):
        self.spark = spark
        self.fs = fs
        self.state_dir = fs.state_dir
        self.kind = manifest["kind"]
        self.params = manifest["params"]
        self.model = manifest["model"]
        # committed data generations: 0 = the build; each add_vectors
        # publishes one more. Pre-r11 manifests carry no key -> [0].
        self.gens = list(manifest.get("gens", [0]))
        # reader-plan cache, keyed on (table, committed-generation set):
        # generation dirs are immutable once committed, so the DataFrame
        # (a plan + file listing, not data) can be reused across probes —
        # every arrival's top_k otherwise pays one parquet footer/schema
        # job PER GENERATION PER TABLE (r13: the semantic-gate row was
        # job-count-bound, ~23 driver round-trips per run). An append or
        # compact changes ``gens`` and therefore the key, so stale plans
        # are never consulted.
        self._gen_df_cache: dict = {}

    # -- generation layout ---------------------------------------------

    def _gen_dir(self, base: str, gen: int) -> str:
        """Directory of one data generation. Generation 0 keeps the
        un-suffixed name (``lists``/``codes``/``corpus``) so pre-r11
        indexes open unchanged; appends land in ``<base>_gen<N>``."""
        loc = self.fs.table_location(base)
        return loc if gen == 0 else f"{loc}_gen{gen}"

    def _read_gens(self, base: str) -> DataFrame:
        """Union-read the COMMITTED generations of one table. Each
        generation dir is read as its own root (IVF dirs are
        list_id-partitioned; per-root reads keep partition pruning
        static — no ambiguous multi-basePath discovery). The assembled
        plan is cached per (table, generation set) — see __init__."""
        key = (base, tuple(self.gens))
        cached = self._gen_df_cache.get(key)
        if cached is not None:
            return cached
        dfs = [
            self.spark.read.parquet(self._gen_dir(base, g)) for g in self.gens
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        self._gen_df_cache[key] = out
        return out

    def _sweep_orphan_gens(self) -> int:
        """Delete generation dirs OUTSIDE the committed set: a crash
        after the staged parquet write but before the manifest commit
        leaves an orphan directory that no reader sees (reads go
        through ``self.gens``) — but the NEXT append must not adopt or
        collide with it; and a crash after a :meth:`compact` commit but
        before its retirement deletes leaves STALE dirs (no longer
        committed) that must not linger. Single-writer contract, same
        as the dedup state's orphan sweep
        (``dedup._BucketedMinhashState``)."""
        import re

        committed = set(self.gens)
        swept = 0
        bases = ["lists"] if self.kind == "ivf" else ["codes", "corpus"]
        names = set(self.fs.listdir(self.state_dir))
        for base in bases:
            prefix = base + "_gen"
            for name in names:
                m = re.fullmatch(re.escape(prefix) + r"(\d+)", name)
                if m and int(m.group(1)) not in committed:
                    self.fs.delete_recursive(
                        self.fs.join(self.state_dir, name)
                    )
                    swept += 1
            # generation 0 lives in the un-suffixed base dir; once a
            # compact retires it, that bare dir is stale too
            if 0 not in committed and base in names:
                self.fs.delete_recursive(self.fs.join(self.state_dir, base))
                swept += 1
        return swept

    # -- construction -------------------------------------------------

    @classmethod
    def _fresh_dir(cls, spark, state_dir: str):
        fs = resolve_statefs(spark, state_dir)
        if fs.manifest_exists():
            raise ValueError(
                f"{state_dir} already holds an ANN index — open() it, or "
                "build into a fresh directory"
            )
        if fs.listdir(fs.state_dir):
            raise ValueError(
                f"{state_dir} is non-empty but has no manifest — refusing "
                "to adopt a foreign directory"
            )
        fs.mkdirs()
        return fs

    @classmethod
    def build_ivf(
        cls,
        spark,
        df: DataFrame,
        state_dir: str,
        *,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        n_lists: int = 16,
        seed: int = 42,
        trainer: str = "sq_kmeans",
    ) -> "PersistentANNIndex":
        """Train IVF lists over ``df`` and persist them. The default
        trainer is the deterministic integer k-means
        (``sq_kmeans``) so a rebuilt index is bit-identical — pass
        ``trainer="mllib"`` for k-means|| seeding at scale."""
        from codd_spark.operators.similarity import ivf_train_assign

        fs = cls._fresh_dir(spark, state_dir)
        assigned, centroids = ivf_train_assign(
            df,
            id_col=id_col,
            emb_col=emb_col,
            n_lists=n_lists,
            seed=seed,
            trainer=trainer,
        )
        # one file per (list, input-partition-that-has-rows); repartition
        # by list_id so each list directory holds one coherent file set
        (
            assigned.repartition(max(len(centroids), 1), "list_id")
            .write.partitionBy("list_id")
            .parquet(fs.table_location("lists"))
        )
        manifest = {
            "kind": "ivf",
            "params": {
                "id_col": id_col,
                "emb_col": emb_col,
                "n_lists": n_lists,
                "seed": seed,
                "trainer": trainer,
            },
            "model": {"centroids": centroids},
            "gens": [0],
        }
        fs.commit_manifest(manifest)  # the publish point
        return cls(spark, state_dir, fs, manifest)

    @classmethod
    def build_pq(
        cls,
        spark,
        df: DataFrame,
        state_dir: str,
        *,
        dim: int,
        m: int = 8,
        k: int = 16,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 10,
        store_corpus: bool = True,
    ) -> "PersistentANNIndex":
        """Train PQ codebooks, encode the corpus, persist codes (+ the
        raw embeddings for exact rerank unless ``store_corpus=False``)."""
        from codd_spark.operators.similarity import pq_train_encode

        fs = cls._fresh_dir(spark, state_dir)
        encoded, codebooks = pq_train_encode(
            df,
            dim=dim,
            m=m,
            k=k,
            id_col=id_col,
            emb_col=emb_col,
            seed=seed,
            max_iter=max_iter,
        )
        encoded.write.parquet(fs.table_location("codes"))
        if store_corpus:
            df.select(id_col, emb_col).write.parquet(
                fs.table_location("corpus")
            )
        manifest = {
            "kind": "pq",
            "params": {
                "id_col": id_col,
                "emb_col": emb_col,
                "dim": dim,
                "m": m,
                "k": k,
                "seed": seed,
                "max_iter": max_iter,
                "has_corpus": store_corpus,
            },
            "model": {"codebooks": codebooks},
            "gens": [0],
        }
        fs.commit_manifest(manifest)
        return cls(spark, state_dir, fs, manifest)

    # -- reload -------------------------------------------------------

    @classmethod
    def open(cls, spark, state_dir: str) -> "PersistentANNIndex":
        """Reload a persisted index — no training pass, no corpus scan;
        the probe-only entry point for later sessions."""
        fs = resolve_statefs(spark, state_dir)
        if not fs.manifest_exists():
            raise ValueError(f"no ANN index manifest at {state_dir}")
        return cls(spark, state_dir, fs, fs.read_manifest())

    @staticmethod
    def exists(state_dir: str, spark=None) -> bool:
        import os
        import re

        mm = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", state_dir)
        if mm is None or mm.group(1).lower() == "file":
            d = state_dir[len(mm.group(0)) :] if mm else state_dir
            d = os.path.abspath(d)
            if os.path.exists(os.path.join(d, "manifest.json")):
                return True
            return any(
                f.startswith("manifest-v") and f.endswith(".json")
                for f in (os.listdir(d) if os.path.isdir(d) else [])
            )
        if spark is None:
            raise ValueError(
                f"{state_dir!r} is an HCFS URI — pass the SparkSession"
            )
        return resolve_statefs(spark, state_dir).manifest_exists()

    # -- growth -------------------------------------------------------

    def add_vectors(self, df: DataFrame) -> int:
        """Append new corpus vectors to a persisted index WITHOUT
        retraining — the crawl-pipeline growth path: the model trains
        once on a representative sample, the corpus keeps arriving.

        - **IVF**: each vector routes to its nearest existing centroid
          (inline literal-centroid argmin — map-only) and lands in that
          list's partition directory of a NEW generation.
        - **PQ**: the batch encodes under the FROZEN codebooks
          (``similarity.pq_encode`` — the identical expression the
          build used), codes + raw embeddings (when the index stores a
          rerank corpus) land in a new generation.

        Crash-atomic via the same protocol as every other persistent
        component (``sources/statefs``): the batch is STAGED into a
        fresh generation directory, then the manifest commit — which
        appends the generation to ``gens`` — is the publish point.
        A crash mid-append leaves an orphan directory no reader sees;
        the next append sweeps it (single-writer contract). One
        routing/encoding pass: the appended count rides the staging
        WRITE as an observed metric (r12 — the former persist+count was
        a whole extra action on the arrival path). Returns the number
        of vectors appended."""
        from pyspark.sql import Observation

        gen = max(self.gens) + 1
        self._sweep_orphan_gens()
        p = self.params
        _n_obs = Observation()
        if self.kind == "ivf":
            from codd_spark.operators.similarity import route_queries_to_lists

            staged = route_queries_to_lists(
                df,
                self.model["centroids"],
                n_probe=1,
                query_id_col=p["id_col"],
                query_emb_col=p["emb_col"],
            ).select(
                F.col(p["id_col"]).alias("neighbor_id"),
                F.col("_qemb").alias("_emb"),
                "list_id",
            ).observe(_n_obs, F.count(F.lit(1)).alias("n"))
            (
                staged.repartition(
                    max(len(self.model["centroids"]), 1), "list_id"
                )
                .write.partitionBy("list_id")
                .parquet(self._gen_dir("lists", gen))
            )
            n = self._observed_n(_n_obs, self._gen_dir("lists", gen))
        elif self.kind == "pq":
            from codd_spark.operators.similarity import pq_encode

            # two consumers when a rerank corpus is stored — persist so
            # the second write reuses the batch; the count still rides
            # the first write's observation. unpersist in finally: a
            # failed write (or a re-raised metric error) must not pin a
            # batch-sized cache entry in a long-lived arrival process.
            batch = df.select(p["id_col"], F.col(p["emb_col"]))
            if p.get("has_corpus"):
                batch = batch.persist()
            try:
                pq_encode(
                    batch.observe(_n_obs, F.count(F.lit(1)).alias("n")),
                    self.model["codebooks"],
                    id_col=p["id_col"],
                    emb_col=p["emb_col"],
                ).write.parquet(self._gen_dir("codes", gen))
                n = self._observed_n(_n_obs, self._gen_dir("codes", gen))
                if p.get("has_corpus") and n > 0:
                    batch.write.parquet(self._gen_dir("corpus", gen))
            finally:
                if p.get("has_corpus"):
                    batch.unpersist()
        else:
            raise ValueError(f"unknown index kind {self.kind!r}")
        if n == 0:
            # never PUBLISH an empty generation: a file-less parquet
            # root breaks every later union-read (no schema to infer) —
            # a latent corruption the r12 observe work surfaced. The
            # staged dir is an orphan; drop it now, manifest untouched.
            self._sweep_orphan_gens()
            return 0
        manifest = {
            "kind": self.kind,
            "params": self.params,
            "model": self.model,
            "gens": self.gens + [gen],
        }
        self.fs.commit_manifest(manifest)  # the publish point
        self.gens.append(gen)
        return n

    def _observed_n(self, obs, staged_dir: str) -> int:
        """Row count from a write-attached Observation. An EMPTY write
        can collapse the plan so the observe node never fires — and on
        engines where stock ``Observation.get`` BLOCKS until the first
        action's metrics arrive (rather than raising, as this Spark
        does), consulting obs for such a write would hang (ADVICE r12).
        So gate on the staged dir FIRST: no data files is the
        verified-zero path and never touches obs. If data files exist,
        the write action definitely fired, so the metric is available
        promptly; a failure there is a real error and returning 0 would
        silently drop an admitted batch — re-raise instead."""
        if not self._has_data_files(staged_dir):
            return 0
        return int(obs.get["n"])

    def _has_data_files(self, d: str) -> bool:
        """Whether a staged generation dir holds any parquet data files
        (one partition level deep — the list_id= layout)."""
        try:
            names = self.fs.listdir(d)
        except Exception:  # noqa: BLE001 — dir never created = no data
            return False
        for nm in names:
            if nm.endswith(".parquet"):
                return True
            sub = self.fs.join(d, nm)
            try:
                if self.fs.is_dir(sub) and any(
                    x.endswith(".parquet") for x in self.fs.listdir(sub)
                ):
                    return True
            except Exception:  # noqa: BLE001 — raced cleanup
                continue
        return False

    def compact(self) -> dict:
        """Rewrite the committed generations as ONE new generation and
        retire the old directories (VERDICT r11 item 2) — the growth
        path's file-count bound: a weekly-append crawl index otherwise
        accumulates generation roots forever (every probe lists and
        union-reads all of them; hundreds of small parquet roots =
        listing overhead + small files). Same crash protocol as the
        dedup state's ``compact()``:

        - the consolidated copy is STAGED as an ordinary next
          generation (an orphan no reader sees — reads go through the
          manifest's ``gens``),
        - row counts are verified EQUAL to the committed window per
          table (a short-read stages fewer rows; refuse to publish),
        - the manifest commit with ``gens = [new]`` is the publish
          point,
        - the old directories are deleted LAST — a crash anywhere
          leaves either the old committed window intact (manifest not
          yet committed; the staged copy is an orphan the next
          append/compact sweeps) or the new one (stale dirs invisible,
          swept on the next append/compact).

        IVF generations re-land partitioned by ``list_id`` with one
        coherent file set per list, so probe-side partition pruning is
        unchanged. Returns {"generation", "dirs_retired", "rows"}."""
        self._sweep_orphan_gens()
        if len(self.gens) == 1:
            return {"generation": self.gens[0], "dirs_retired": 0, "rows": {}}
        gen = max(self.gens) + 1
        if self.kind == "ivf":
            bases = ["lists"]
        else:
            bases = ["codes"] + (
                ["corpus"] if self.params.get("has_corpus") else []
            )
        rows: dict[str, int] = {}
        staged: list[str] = []
        try:
            for base in bases:
                src = self._read_gens(base)
                n_old = src.count()
                dst = self._gen_dir(base, gen)
                if base == "lists":
                    (
                        src.repartition(
                            max(len(self.model["centroids"]), 1), "list_id"
                        )
                        .write.partitionBy("list_id")
                        .parquet(dst)
                    )
                else:
                    src.write.parquet(dst)
                staged.append(dst)
                n_new = self.spark.read.parquet(dst).count()
                if n_new != n_old:
                    raise RuntimeError(
                        f"ANN compaction row mismatch on {base!r} "
                        f"({n_old} -> {n_new}); manifest not committed — "
                        "staged generation deleted, index unchanged"
                    )
                rows[base] = n_new
        except BaseException:
            for dst in staged:
                try:
                    self.fs.delete_recursive(dst)
                except Exception:  # noqa: BLE001 — sweep again next open
                    pass
            raise
        old_gens = list(self.gens)
        manifest = {
            "kind": self.kind,
            "params": self.params,
            "model": self.model,
            "gens": [gen],
        }
        self.fs.commit_manifest(manifest)  # the publish point
        self.gens = [gen]
        retired = 0
        for base in bases:
            for g in old_gens:
                d = self._gen_dir(base, g)
                if self.fs.exists(d):
                    self.fs.delete_recursive(d)
                    retired += 1
        return {"generation": gen, "dirs_retired": retired, "rows": rows}

    # -- search -------------------------------------------------------

    def top_k(
        self,
        queries: DataFrame,
        *,
        k: int = 10,
        n_probe: int = 3,
        query_id_col: str = "query_id",
        query_emb_col: str = "q_emb",
        rerank_factor: int = 5,
    ) -> DataFrame:
        """(query_id, neighbor_id, cos_sim, rank): approximate top-k
        from the persisted index. IVF probes read only the routed list
        partitions; PQ scans the compact codes (ADC) and exact-reranks
        against the stored corpus when one was persisted."""
        if self.kind == "ivf":
            from codd_spark.operators.similarity import ivf_probe

            lists = self._read_gens("lists")
            return ivf_probe(
                lists,
                self.model["centroids"],
                queries,
                k=k,
                n_probe=n_probe,
                query_id_col=query_id_col,
                query_emb_col=query_emb_col,
                prune_lists=True,
            )
        if self.kind == "pq":
            from codd_spark.operators.similarity import pq_top_k

            p = self.params
            encoded = self._read_gens("codes")
            rerank = (
                self._read_gens("corpus") if p.get("has_corpus") else None
            )
            return pq_top_k(
                encoded,
                self.model["codebooks"],
                queries,
                k=k,
                id_col=p["id_col"],
                query_id_col=query_id_col,
                query_emb_col=query_emb_col,
                rerank=rerank,
                emb_col=p["emb_col"],
                rerank_factor=rerank_factor,
            )
        raise ValueError(f"unknown index kind {self.kind!r}")


# Default generation bound for the semantic gate's auto-compaction: the
# r12 16-arrival stress read ~18% probe creep at 16 accumulated
# generations and a 2.6 s fold restoring the floor; folding at 8 keeps
# worst-case creep under ~10% with the fold cost amortized to a few
# percent per arrival (r13 64-arrival table in BASELINE.md).
_DEFAULT_COMPACT_EVERY = 8


class IncrementalSemanticDecontaminator:
    """Arrival-order SEMANTIC decontamination against a GROWING
    persisted ANN index (VERDICT r11 item 8) — the semantic sibling of
    ``dedup.IncrementalExactDeduplicator``, with "same key" generalized
    to "cosine >= threshold under the index's probe": each arriving
    batch of embedded documents probes the index for near-dups against
    the ACCUMULATED kept corpus; contaminated arrivals (best probed
    cosine >= ``threshold``) are dropped, survivors are ADMITTED — a
    crash-atomic ``add_vectors`` generation — so later arrivals see
    them. Earlier-kept-wins, exactly the exact-key arrival contract.

    The drop decision compares the 6-dp-ROUNDED cosine (the value
    ``ivf_probe`` emits and every ANN oracle hash-matches) against the
    threshold, so engine and oracle agree whenever the rounded scores
    do — a raw-float compare would let a low-bit summation difference
    flip a borderline admission.

    Scope: CROSS-CORPUS only. Two near-identical vectors arriving in
    the same batch are both admitted (run a batch-level semantic dedup
    — ``similarity.embedding_near_duplicates`` / ``semantic_dedup`` —
    upstream when that matters). This keeps the per-arrival cost at
    one routed probe + one generational append and makes the semantics
    exactly replayable without per-batch closure machinery.

    Per-arrival scale shape: the probe reads ONLY the routed list
    partitions of every committed generation (static pruning — see
    ``PersistentANNIndex.top_k``), the routed queries broadcast (the
    corpus side never shuffles), the admission append is map-only
    routing + one partitioned write. State growth is corpus-linear;
    call :meth:`compact` periodically to fold generations.
    """

    def __init__(
        self,
        spark,
        state_dir: str,
        *,
        corpus: DataFrame | None = None,
        threshold: float = 0.92,
        n_probe: int = 3,
        n_lists: int = 16,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        trainer: str = "sq_kmeans",
        seed: int = 42,
        compact_every: int | None = _DEFAULT_COMPACT_EVERY,
    ):
        """``compact_every=N`` folds the index's generations whenever an
        admission leaves N or more committed — the ops knob that keeps a
        long-lived gate's probe cost and file count flat (measured
        BASELINE.md: 12 gens probe 1.8x slower than compacted) without
        the caller scheduling maintenance. Compaction provably preserves
        every future decision (probe equality is tested).

        ON BY DEFAULT at 8 generations since r13 (VERDICT r12 item 7):
        a long-horizon gate left on defaults must stay flat — the
        64-arrival stress (BASELINE.md) pins per-arrival wall within
        ~1.2x of the single-generation floor across the whole run, with
        the fold cost amortized to a few percent per arrival. Pass
        ``compact_every=None`` to opt out (caller schedules
        maintenance)."""
        if not (0.0 < threshold <= 1.0):
            raise ValueError(f"threshold must be in (0, 1], got {threshold}")
        if compact_every is not None and compact_every < 2:
            raise ValueError(
                f"compact_every must be >= 2 generations, got {compact_every}"
            )
        self.spark = spark
        self.threshold = float(threshold)
        self.n_probe = n_probe
        self.compact_every = compact_every
        self.id_col, self.emb_col = id_col, emb_col
        if PersistentANNIndex.exists(state_dir, spark):
            if corpus is not None:
                raise ValueError(
                    f"{state_dir} already holds an index — open it without "
                    "a corpus, or build into a fresh directory"
                )
            self.index = PersistentANNIndex.open(spark, state_dir)
        else:
            if corpus is None:
                raise ValueError(
                    f"no index at {state_dir} — pass corpus= to build the "
                    "initial kept corpus"
                )
            self.index = PersistentANNIndex.build_ivf(
                spark,
                corpus,
                state_dir,
                id_col=id_col,
                emb_col=emb_col,
                n_lists=n_lists,
                seed=seed,
                trainer=trainer,
            )

    def add_batch(self, batch: DataFrame) -> DataFrame:
        """Probe-then-admit one arrival: returns the KEPT rows (original
        columns plus ``max_sim`` — the best probed cosine against the
        corpus as it stood BEFORE this batch, NULL when no candidate
        fell in the probed lists) and appends them to the index.
        ``max_sim`` is the one RESERVED output name (an input column of
        that name is refused — silently shadowing it would corrupt the
        caller's data); probe-internal columns use ``__sem_``-prefixed
        names so ordinary caller columns (``query_id`` provenance etc.)
        pass through untouched."""
        for reserved in ("max_sim", "__sem_qid", "__sem_max_sim"):
            if reserved in batch.columns:
                raise ValueError(
                    f"batch column {reserved!r} collides with add_batch's "
                    "reserved output/internal names — rename it upstream"
                )
        from codd_spark.operators.dedup import arrival_shuffle_partitions

        # per-arrival actions (probe checkpoint + admission write) run
        # at batch-sized shuffle partitions (guide §2 — see
        # arrival_shuffle_partitions); the routed-list scan and the
        # generational append keep their own explicit partitioning
        with arrival_shuffle_partitions(self.spark, batch):
            return self._add_batch_inner(batch)

    def _add_batch_inner(self, batch: DataFrame) -> DataFrame:
        queries = batch.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.emb_col).alias("q_emb"),
        )
        best = (
            self.index.top_k(queries, k=1, n_probe=self.n_probe)
            .select(
                F.col("query_id").alias("__sem_qid"),
                F.col("cos_sim").alias("__sem_max_sim"),
            )
        )
        kept = (
            batch.join(
                best.hint("shuffle_merge"),
                batch[self.id_col] == best["__sem_qid"],
                how="left",
            )
            .where(
                F.col("__sem_max_sim").isNull()
                | (F.col("__sem_max_sim") < F.lit(self.threshold))
            )
            .drop("__sem_qid")
            .withColumnRenamed("__sem_max_sim", "max_sim")
            # LAZY: the probe materializes (and its lineage cuts) inside
            # the admission write below — the eager checkpoint here was
            # one whole extra Spark action per arrival (r14, the same
            # merge as the r13 incremental-dedup checkpoint fold)
            .localCheckpoint(eager=False)
        )
        self.index.add_vectors(kept.select(self.id_col, self.emb_col))
        if (
            self.compact_every is not None
            and len(self.index.gens) >= self.compact_every
        ):
            self.index.compact()
        return kept

    def compact(self) -> dict:
        """Fold the index's committed generations into one (see
        ``PersistentANNIndex.compact``)."""
        return self.index.compact()
