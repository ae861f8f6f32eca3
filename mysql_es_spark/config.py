"""Engine configuration.

Analog of the reference's config layer (``setting/River.java:83-436``,
``setting/Config.java:13-14``): where mysql-es declares per-table index
names, pk, columns, relations and sync flags in ``etc/river.json``, we
declare the fulltext/index parameters once as a frozen dataclass. The
BM25 constants mirror the ES 6.x defaults the reference inherits by not
overriding ``similarity`` in ``etc/template.json`` (Lucene k1=1.2, b=0.75).
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class IndexConfig:
    # --- BM25 scoring contract (SURVEY.md §2.9 T5) ---
    k1: float = 1.2
    b: float = 0.75

    # --- analyzer (template.json T1/T2) ---
    # index-analyzer edge-ngram expansion (reference applies it to
    # name/phone fields only, etc/template.json:74-96); default off for
    # the transcripts engine, exercised by dedicated tests.
    edge_ngram: bool = False
    edge_ngram_min: int = 2
    edge_ngram_max: int = 25
    # store per-occurrence token positions in the posting blocks (enables
    # indexed phrase queries — ES match_phrase; Lucene stores positions by
    # default). Off by default: the transcripts north rule needs only BM25,
    # and positions add ~log2(gap) bits per token occurrence.
    with_positions: bool = False
    # index-time synonym rules in ES synonym-file syntax, e.g.
    # ("car, auto", "tv => television"). Equivalence rules inject the
    # other class members at the SAME position (Lucene posincr 0, not
    # counted in dl — discountOverlaps); explicit rules REPLACE the LHS
    # tokens with the RHS. Applied by the index analyzer only; the search
    # analyzer stays synonym-free (the standard ES index-time setup).
    synonyms: tuple[str, ...] = ()

    # --- physical layout ---
    # Postings per encoded block (delta-gap + FOR bit-packing; block_max
    # score bound stored per block for pruned query evaluation).
    block_size: int = 128
    # conv_id hash buckets: the unit of build resume/lineage. At 100 TB
    # this would be ~4096; small here so tests exercise multi-wave resume.
    n_buckets: int = 16
    # buckets built per wave (one Spark job per wave; lineage committed
    # between waves so a killed build resumes at wave granularity).
    wave_size: int = 8
    # docids per range-salt: bounds the number of postings any single
    # reducer sees for one term — a Zipf head term's postings are split
    # into ceil(N/salt_docs) independent, already-ordered groups, so the
    # classic "one reducer owns the stop-word" skew cannot occur.
    salt_docs: int = 1 << 14
    # hash(term) partition count of the postings table; query-time term
    # lookups prune to 1/term_buckets of the files.
    term_buckets: int = 32

    # query-side: candidate multiplier for the two-phase block-max pruned
    # top-k (phase 1 scores the highest-upper-bound ranges covering
    # >= candidate_factor*k docs to establish a threshold).
    candidate_factor: int = 8
    # pruned-query salt selection: when the corpus has more salt ranges
    # than this (predicted as n_docs/salt_docs, no extra job), the
    # per-salt upper-bound ranking runs distributed (TakeOrdered + joins)
    # instead of a driver-side collect — at 10^12 docs a head term spans
    # ~10^7 salts, far past any sane collect.
    max_driver_salts: int = 65536
    # mode="auto" crossover (round 4): queries whose total posting volume
    # (Σ df over query terms, known from the term_meta job the simple
    # path needs anyway) is at or below this run the SINGLE-action full
    # decode; above it, the multi-phase block-max pruned path runs. This
    # is a DEPLOYMENT knob ≈ decode throughput × latency budget: local[32]
    # decodes ~8M postings/s, so the 32M default keeps every full decode
    # under ~4 s while 10^12-doc head terms (df ~10^11) still route to
    # pruning. Measured at 12.16M docs: auto-simple answers a mid-term
    # query in 1.07 s and a head bigram in 2.83 s where the always-pruned
    # path took 2.8/4.9 s — on a uniform-tf corpus block-max bounds prune
    # nothing, so the two extra actions are pure overhead; on skewed real
    # corpora (the documents bench) pruning wins and Σ df picks it.
    auto_pruned_min_postings: int = 1 << 25
    # mode="auto" crossover, CALIBRATED (round 5): when the index's
    # index_meta carries a build-time measured decode_rows_per_sec (one
    # timed probe over the head terms' postings at finalize — see
    # plans/build._decode_probe) and the caller left
    # auto_pruned_min_postings at its default, the effective threshold is
    # measured_rate × this latency budget instead of the static 32M —
    # deployments stop guessing their decode throughput. An explicit
    # caller auto_pruned_min_postings always wins; indexes too small to
    # measure meaningfully (< ~1M probe postings) keep the static value.
    auto_latency_budget_sec: float = 2.0

    def with_(self, **kw) -> "IndexConfig":
        return replace(self, **kw)


DEFAULT = IndexConfig()
