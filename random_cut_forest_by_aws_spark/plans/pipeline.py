"""End-to-end corpus curation: the composition a training-data team
actually runs, wired from the engine's individual operators.

    raw documents
      → quality funnel         (funnel.filter_funnel — one scan,
                                per-stage drop accounting)
      → near-dup resolution    (dedup.minhash_candidates →
                                dedup.ngram_jaccard verify →
                                dedup.duplicate_clusters keep-one)
      → decontamination        (contamination.ngram_contamination vs an
                                optional eval set — drop overlapping docs)
      → train/val/test splits  (splits.assign_splits keyed on the DUP
                                CLUSTER id, so no near-duplicate of a
                                test doc can reach train)
      → mixture sampling       (mixing.mixture_sample, train only)
      → sequence packing       (packing.pack_sequences, train only)
      → sharded sink           (sinks.shards.write_packed_shards)

Scale shape: the corpus is scanned once per phase that genuinely needs
its text (funnel, shingles, contamination grams); everything else moves
candidate pairs, cluster labels, or aggregate rows. No driver-side
loops, no RNG state — every decision is a deterministic function of
document identity, so backfills reproduce the identical dataset.

This is deliberately a THIN composition (each operator keeps its own
contract and tests); the value here is the documented joint semantics —
especially split-by-cluster, the leakage rule most pipelines get wrong.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.contamination import ngram_contamination
from ..operators.dedup import duplicate_clusters, minhash_candidates, ngram_jaccard
from ..operators.funnel import filter_funnel
from ..operators.mixing import mixture_sample
from ..operators.packing import pack_sequences
from ..operators.splits import assign_splits
from ..sinks.shards import write_packed_shards


@dataclass
class CurationConfig:
    qc_stages: list[tuple[str, str]] = field(
        default_factory=lambda: [("min_len", "n_chars >= 50")]
    )
    # near-dup resolution
    shingle_k: int = 3
    num_hashes: int = 32
    bands: int = 8
    jaccard_threshold: float = 0.5
    # decontamination (only when eval_docs passed)
    contamination_n: int = 8
    max_overlap_frac: float = 0.0  # drop any doc sharing an eval n-gram
    # splits (cluster-keyed)
    splits: dict[str, float] = field(
        default_factory=lambda: {"train": 0.75, "val": 0.125, "test": 0.125}
    )
    split_seed: int = 42
    # mixture (None = keep everything)
    mixture_weights: dict[str, float] | None = None
    mixture_default: float = 1.0
    mixture_seed: int = 42
    # packing / sink
    pack_budget: int = 2048
    packs_per_shard: int = 1024
    id_col: str = "doc_id"
    text_col: str = "text"
    source_col: str = "source"


@dataclass
class CurationResult:
    funnel_report: DataFrame   # stage_idx, stage, dropped, remaining
    clusters: DataFrame        # doc_id, cluster_id, is_canonical (dup docs)
    documents: DataFrame       # curated docs + cluster_id + split
    train: DataFrame           # post-mixture training documents (+ n_tok)
    packed: DataFrame          # pack_sequences output over train
    contaminated: DataFrame | None  # dropped by decontamination (or None)


def curate_corpus(
    docs: DataFrame,
    cfg: CurationConfig | None = None,
    eval_docs: DataFrame | None = None,
    out_path: str | None = None,
) -> CurationResult:
    """Run the full curation chain; write shards when ``out_path`` is
    given.

    Materialization: the dedup intermediates (candidate pairs, verified
    edges) are EAGERLY computed at call time (localCheckpoint — see the
    inline note), and ``duplicate_clusters`` runs its label-propagation
    rounds eagerly too; the corpus-sized DataFrames in the result
    (documents/train/packed) stay lazy. Callers that want only the
    funnel report should call ``funnel.filter_funnel`` directly."""
    cfg = cfg or CurationConfig()
    ic, tc, sc = cfg.id_col, cfg.text_col, cfg.source_col

    survivors, funnel_report = filter_funnel(docs, cfg.qc_stages)

    # near-duplicate keep-one: candidates → exact-Jaccard verify →
    # connected components; docs outside any verified pair are their own
    # (canonical) singleton cluster
    # candidate pairs and verified edges are eagerly localCheckpoint-ed:
    # both are tiny (near-dup pairs, not corpus rows) while their
    # producing chains are the pipeline's most expensive (minhash
    # signatures / shingle sets) AND their logical plans are enormous —
    # downstream consumers reference each several times, and a plain
    # persist() keeps the full lineage inside the cached plan, which the
    # CacheManager then re-canonicalizes on EVERY downstream query
    # (measured 5-20x driver-side planning slowdown on the whole
    # pipeline). Checkpointing truncates the lineage to a leaf. Local
    # (executor-storage) checkpoints are the right default here; a
    # lost-executor recompute safety net would use reliable
    # checkpointing or a parquet round-trip instead.
    pairs = minhash_candidates(
        survivors, id_col=ic, text_col=tc, shingle_k=cfg.shingle_k,
        num_hashes=cfg.num_hashes, bands=cfg.bands,
    ).localCheckpoint(eager=True)
    verified = (
        ngram_jaccard(survivors, pairs, id_col=ic, text_col=tc,
                      shingle_k=cfg.shingle_k)
        .filter(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    clusters = duplicate_clusters(verified)
    withc = (
        # explicit broadcast: clusters is candidate-pair-sized but its
        # stats come out of iterative label propagation (unknown to the
        # planner) — don't gamble a full-corpus sort-merge shuffle on
        # AQE's runtime conversion
        survivors.join(
            F.broadcast(clusters), survivors[ic] == clusters["doc_id"], "left"
        )
        .drop(clusters["doc_id"])
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(ic)))
        .withColumn("is_canonical", F.coalesce("is_canonical", F.lit(True)))
    )
    kept = withc.filter("is_canonical").drop("is_canonical")

    contaminated = None
    if eval_docs is not None:
        hits = ngram_contamination(
            kept, eval_docs, n=cfg.contamination_n, id_col=ic, text_col=tc
        )
        contaminated = hits.filter(
            F.col("overlap_frac") > cfg.max_overlap_frac
        ).select(ic, "n_overlap", "n_ngrams", "overlap_frac")
        kept = kept.join(
            F.broadcast(contaminated.select(ic)), ic, "left_anti"
        )

    # split on the CLUSTER id: a near-duplicate of a val/test doc can
    # never land in train, even when both members survived keep-one on
    # different corpora versions
    documents = assign_splits(
        kept, cfg.splits, key_col=ic, group_col="cluster_id",
        seed=cfg.split_seed,
    )

    train = documents.filter(F.col("split") == "train")
    if cfg.mixture_weights is not None:
        train = mixture_sample(
            train, cfg.mixture_weights, id_col=ic, source_col=sc,
            seed=cfg.mixture_seed, default_weight=cfg.mixture_default,
        )
    train = train.withColumn(
        "n_tok", F.size(F.split(F.col(tc), " ")).cast("bigint")
    )
    packed = pack_sequences(
        train, cfg.pack_budget, "n_tok", key_col=sc, order_col=ic
    )
    if out_path is not None:
        write_packed_shards(
            packed, out_path, packs_per_shard=cfg.packs_per_shard,
            key_col=sc, id_col=ic,
        )
    return CurationResult(
        funnel_report=funnel_report,
        clusters=clusters,
        documents=documents,
        train=train,
        packed=packed,
        contaminated=contaminated,
    )
