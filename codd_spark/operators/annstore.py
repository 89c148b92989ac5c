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
        static — no ambiguous multi-basePath discovery)."""
        dfs = [
            self.spark.read.parquet(self._gen_dir(base, g)) for g in self.gens
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def _sweep_orphan_gens(self) -> int:
        """Delete generation dirs ABOVE the committed set: a crash after
        the staged parquet write but before the manifest commit leaves
        an orphan directory that no reader sees (reads go through
        ``self.gens``) — but the NEXT append must not adopt or collide
        with it. Single-writer contract, same as the dedup state's
        orphan sweep (``dedup._BucketedMinhashState``)."""
        import re

        committed = set(self.gens)
        swept = 0
        bases = ["lists"] if self.kind == "ivf" else ["codes", "corpus"]
        for base in bases:
            prefix = base + "_gen"
            for name in self.fs.listdir(self.state_dir):
                m = re.fullmatch(re.escape(prefix) + r"(\d+)", name)
                if m and int(m.group(1)) not in committed:
                    self.fs.delete_recursive(
                        self.fs.join(self.state_dir, name)
                    )
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
        routing/encoding pass: the staged batch is persisted, counted,
        and written from the same materialization. Returns the number
        of vectors appended."""
        gen = max(self.gens) + 1
        self._sweep_orphan_gens()
        p = self.params
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
            )
            staged = staged.persist()
            n = staged.count()
            (
                staged.repartition(
                    max(len(self.model["centroids"]), 1), "list_id"
                )
                .write.partitionBy("list_id")
                .parquet(self._gen_dir("lists", gen))
            )
            staged.unpersist()
        elif self.kind == "pq":
            from codd_spark.operators.similarity import pq_encode

            batch = df.select(
                p["id_col"], F.col(p["emb_col"])
            ).persist()
            n = batch.count()
            pq_encode(
                batch,
                self.model["codebooks"],
                id_col=p["id_col"],
                emb_col=p["emb_col"],
            ).write.parquet(self._gen_dir("codes", gen))
            if p.get("has_corpus"):
                batch.write.parquet(self._gen_dir("corpus", gen))
            batch.unpersist()
        else:
            raise ValueError(f"unknown index kind {self.kind!r}")
        manifest = {
            "kind": self.kind,
            "params": self.params,
            "model": self.model,
            "gens": self.gens + [gen],
        }
        self.fs.commit_manifest(manifest)  # the publish point
        self.gens.append(gen)
        return n

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
