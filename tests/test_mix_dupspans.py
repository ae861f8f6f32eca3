"""epoch_mix (upsampling domain mix) + dup_spans (exact substring dedup)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mysql_es_spark.functions.analyze import tokenize_text
from mysql_es_spark.operators.dedup import dup_spans
from mysql_es_spark.operators.sampling import epoch_mix


def _h32(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % (2**32)


def test_epoch_mix_matches_python(spark, tiny_transcripts):
    df = tiny_transcripts.limit(400).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "role"
    )
    epochs = {"user": 2.5, "assistant": 0.4, "tool": 1.0}
    got = Counter(
        (r.doc_id, r.epoch)
        for r in epoch_mix(df, "role", epochs, id_col="doc_id").collect()
    )
    assert all(v == 1 for v in got.values())  # (id, epoch) unique
    want: Counter = Counter()
    for r in df.collect():
        e = epochs[r.role]
        n = int(e) + (1 if _h32(r.doc_id) < round((e - int(e)) * 2**32) else 0)
        for i in range(n):
            want[(r.doc_id, i)] = 1
    assert got == want
    # upsampling genuinely happened: some doc appears 3 times (2.5 epochs)
    per_doc = Counter(d for d, _ in got)
    assert max(per_doc.values()) == 3
    # epochs <= 1 with zero fraction drop strata entirely
    none = epoch_mix(df, "role", {"user": 0.0}, id_col="doc_id", default=0.0)
    assert none.count() == 0


def test_epoch_mix_validation(spark, tiny_transcripts):
    df = tiny_transcripts.limit(10).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "role"
    )
    with pytest.raises(ValueError):
        epoch_mix(df, "role", {"user": -1.0})
    with pytest.raises(ValueError):
        epoch_mix(df, "role", {"user": 1.0}, default=-0.5)


def test_dup_spans_matches_python(spark):
    """Synthetic corpus with a planted duplicated passage."""
    passage = " ".join(f"p{i}" for i in range(8))
    rows = [
        (0, f"a b c {passage} d e f"),
        (1, f"x y {passage} z w " + passage),  # twice in one doc
        (2, "unrelated words only here nothing repeats at all today"),
        (3, f"q r s t u v {passage}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    N = 5
    got = sorted(
        (r.doc_id, r.start, r.end, r.n_windows)
        for r in dup_spans(df, n=N, min_count=2).collect()
    )

    # python oracle
    toks = {d: tokenize_text(t) for d, t in rows}
    occ: dict[tuple, list] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - N + 1):
            occ.setdefault(tuple(ts[i : i + N]), []).append((d, i))
    flagged: dict[int, list] = {}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        places.sort()
        for d, i in places[1:]:
            flagged.setdefault(d, []).append((i, i + N))
    want = []
    for d, spans in flagged.items():
        spans.sort()
        cur_s, cur_e, nw = spans[0][0], spans[0][1], 1
        for s, e in spans[1:]:
            if s > cur_e:
                want.append((d, cur_s, cur_e, nw))
                cur_s, cur_e, nw = s, e, 1
            else:
                cur_e, nw = max(cur_e, e), nw + 1
        want.append((d, cur_s, cur_e, nw))
    assert got == sorted(want)
    # the first occurrence (doc 0) is never cut; later docs are
    docs_cut = {d for d, *_ in got}
    assert 0 not in docs_cut and {1, 3} <= docs_cut and 2 not in docs_cut


def test_dup_spans_corpus_scale(spark, tiny_transcripts):
    """On the Zipf corpus, short-n (n=3) spans must exist, merge correctly, and
    never overlap within a doc."""
    df = tiny_transcripts.limit(500).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
    )
    got = dup_spans(df, n=3, min_count=2).collect()
    assert got, "no duplicated 3-gram in a Zipf corpus — implausible"
    by_doc: dict[int, list] = {}
    for r in got:
        assert r.end - r.start >= 3 and r.n_windows >= 1
        by_doc.setdefault(r.doc_id, []).append((r.start, r.end))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # merged: no overlapping/adjacent-overlap spans
