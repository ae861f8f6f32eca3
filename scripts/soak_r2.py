#!/usr/bin/env python
"""Round-2 correctness soak: randomized queries across the full query
surface vs pure-Python oracles on a fresh corpus (never the test fixture).

Covers: bm25 simple / pruned / distributed-forced pruned, conjunctive,
phrase (ordered, slop, unordered span_near), synonyms (dis-max), LM
Dirichlet, msearch batch, search_after pagination consistency.

Usage: python scripts/soak_r2.py [--turns 6000] [--rounds 40] [--seed 777]
Prints one JSON line: {"checks": N, "mismatches": 0, ...}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import re
import shutil
import sys
import tempfile
from collections import Counter

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=6000)
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from mysql_es_spark.config import IndexConfig
    from mysql_es_spark.corpus import transcripts_df
    from mysql_es_spark.functions.analyze import tokenize_text
    from mysql_es_spark.operators.query import (
        _INTERVAL_FILTER_RULES,
        bm25_topk,
        bm25_topk_conjunctive,
        bm25_topk_multi,
        intervals_filter_topk,
        sparse_vector_topk,
        boosting_topk,
        constant_score_topk,
        exists_topk,
        has_parent_topk,
        ids_topk,
        lm_dirichlet_topk,
        match_bool_prefix_topk,
        phrase_prefix_topk,
        phrase_topk,
        pinned_topk,
        regexp_topk,
        span_first_topk,
        span_not_topk,
        synonym_topk,
        terms_set_topk,
    )
    from mysql_es_spark.oracle import build_oracle_index, score_query
    from mysql_es_spark.plans.build import build_index
    from mysql_es_spark.session import get_spark

    spark = get_spark("soak_r2", cores=args.cores, shuffle_partitions=16)
    cfg = IndexConfig(
        n_buckets=8, wave_size=4, salt_docs=512, term_buckets=8, block_size=32,
        with_positions=True,
    )
    ix = os.path.join(tempfile.gettempdir(), "soak_r2_ix")
    shutil.rmtree(ix, ignore_errors=True)
    df = transcripts_df(spark, args.turns, seed=args.seed)
    build_index(spark, df, ix, cfg)
    fwd = spark.read.parquet(f"{ix}/forward").select(
        "docid", "conv_id", "turn_idx", "doc_key", "tool", "text"
    ).collect()
    docs = {r.docid: r.text for r in fwd}
    conv_of = {r.docid: r.conv_id for r in fwd}
    turn_of = {r.docid: r.turn_idx for r in fwd}
    key_of = {r.docid: r.doc_key for r in fwd}
    tool_null = {r.docid: r.tool is None for r in fwd}
    toks = {d: tokenize_text(t) for d, t in docs.items()}
    oix = build_oracle_index(list(docs.items()))
    vocab = sorted({t for ts in toks.values() for t in ts})
    rng = random.Random(args.seed)

    checks = mismatches = 0
    fails: list[str] = []

    def expect_rank(name, got_rows, want, tol=1e-9):
        nonlocal checks, mismatches
        checks += 1
        g = [(r.docid, r.score) for r in got_rows]
        if [d for d, _ in g] != [d for d, _ in want] or any(
            not math.isclose(gs, ws, abs_tol=tol) for (_, gs), (_, ws) in zip(g, want)
        ):
            mismatches += 1
            fails.append(f"{name}: got={g[:5]} want={want[:5]}")

    for rnd in range(args.rounds):
        q_terms = rng.sample(vocab, rng.randint(2, 4))
        q = " ".join(q_terms)
        k = rng.choice([5, 10, 25])

        full = score_query(oix, q, k=len(docs))
        want = full[:k]
        expect_rank(f"r{rnd}-simple", bm25_topk(spark, ix, q, k=k, cfg=cfg).collect(), want)
        expect_rank(
            f"r{rnd}-pruned",
            bm25_topk(spark, ix, q, k=k, cfg=cfg, mode="pruned").collect(),
            want,
        )
        if rnd % 5 == 0:
            dist_cfg = cfg.with_(max_driver_salts=0)
            expect_rank(
                f"r{rnd}-dist",
                bm25_topk(spark, ix, q, k=k, cfg=dist_cfg, mode="pruned").collect(),
                want,
            )

        # conjunctive: all terms present
        conj_docs = {d for d, ts in toks.items() if all(t in ts for t in q_terms)}
        want_c = [(d, s) for d, s in full if d in conj_docs][:k]
        expect_rank(
            f"r{rnd}-conj",
            bm25_topk_conjunctive(spark, ix, q, k=k, cfg=cfg).collect(),
            want_c,
        )

        # sparse_vector: random weights replace idf, saturation unchanged
        sv_w = {t: round(rng.uniform(0.1, 4.0), 3) for t in q_terms}
        sv_sc = {}
        for d, ts in toks.items():
            tf = Counter(ts)
            s = sum(
                w * tf[t] / (tf[t] + 1.2 * (0.25 + 0.75 * len(ts) / oix.avgdl))
                for t, w in sv_w.items()
                if t in tf
            )
            if s > 0:
                sv_sc[d] = s
        want_sv = sorted(sv_sc.items(), key=lambda x: (-x[1], x[0]))[:k]
        expect_rank(
            f"r{rnd}-sparse_vector",
            sparse_vector_topk(
                spark, ix, sv_w, k=k, cfg=cfg,
                mode=rng.choice(["simple", "pruned"]),
            ).collect(),
            want_sv,
        )

        # intervals filter rules: single-term source vs single-term filter
        iv_rule = rng.choice(list(_INTERVAL_FILTER_RULES))
        st, ft = rng.sample(vocab, 2)
        n_d, avgdl_d = oix.n_docs, oix.avgdl
        dfq = Counter(t for ts in toks.values() for t in set(ts))
        base = iv_rule[4:] if iv_rule.startswith("not_") else iv_rule
        iv_sc = {}
        for d, ts in toks.items():
            s_pos = [i for i, t in enumerate(ts) if t == st]
            f_pos = [i for i, t in enumerate(ts) if t == ft]
            keep = 0
            for p in s_pos:
                if base in ("overlapping", "containing", "contained_by"):
                    hit = p in f_pos  # width-1 spans: all three reduce to equality
                elif base == "before":
                    hit = any(p < fp for fp in f_pos)
                else:  # after
                    hit = any(fp < p for fp in f_pos)
                keep += (not hit) if iv_rule.startswith("not_") else hit
            if keep:
                w = float(np.log(1.0 + (n_d - dfq[st] + 0.5) / (dfq[st] + 0.5)))
                tf_v = len(s_pos)
                iv_sc[d] = w * tf_v / (
                    tf_v + 1.2 * (0.25 + 0.75 * len(ts) / avgdl_d)
                )
        want_iv = sorted(iv_sc.items(), key=lambda x: (-x[1], x[0]))[:k]
        expect_rank(
            f"r{rnd}-ivfilter-{iv_rule}",
            intervals_filter_topk(spark, ix, st, iv_rule, ft, k=k, cfg=cfg)
            .select("docid", "score").collect(),
            want_iv,
        )

        # synonyms (dis-max): 2 clauses with random expansion
        c1, c2 = rng.sample(vocab, 2)
        syn = {c1: [rng.choice(vocab)], c2: []}
        clauses = {c1: [c1, *syn[c1]], c2: [c2]}
        sc = {}
        n, avgdl = oix.n_docs, oix.avgdl
        dfreq = Counter(t for ts in toks.values() for t in set(ts))
        for d, ts in toks.items():
            tf = Counter(ts)
            s, hit = 0.0, False
            for exps in clauses.values():
                best = 0.0
                for e in exps:
                    if e in tf:
                        w = float(np.log(1.0 + (n - dfreq[e] + 0.5) / (dfreq[e] + 0.5)))
                        best = max(best, w * tf[e] / (tf[e] + 1.2 * (0.25 + 0.75 * len(ts) / avgdl)))
                if best > 0:
                    hit, s = True, s + best
            if hit:
                sc[d] = s
        want_s = sorted(sc.items(), key=lambda x: (-x[1], x[0]))[:k]
        expect_rank(
            f"r{rnd}-syn",
            synonym_topk(spark, ix, f"{c1} {c2}", syn, k=k, cfg=cfg).collect(),
            want_s,
        )

        # phrase ordered / unordered on a sampled real bigram
        src = rng.choice([d for d, ts in toks.items() if len(ts) >= 2])
        i = rng.randrange(len(toks[src]) - 1)
        a, b = toks[src][i], toks[src][i + 1]
        ph_docs = {
            d
            for d, ts in toks.items()
            if any(ts[j : j + 2] == [a, b] for j in range(len(ts) - 1))
        }
        ph_terms = list(dict.fromkeys([a, b]))
        want_p = [(d, s) for d, s in score_query(oix, " ".join(ph_terms), k=len(docs)) if d in ph_docs][:k]
        expect_rank(
            f"r{rnd}-phrase",
            phrase_topk(spark, ix, f"{a} {b}", k=k, cfg=cfg).collect(),
            want_p,
        )
        if a != b:
            span_docs = set()
            for d, ts in toks.items():
                pa = [j for j, x in enumerate(ts) if x == a]
                pb = [j for j, x in enumerate(ts) if x == b]
                if pa and pb and min(abs(x - y) for x in pa for y in pb) <= 2:
                    span_docs.add(d)
            want_u = [
                (d, s) for d, s in score_query(oix, f"{a} {b}", k=len(docs)) if d in span_docs
            ][:k]
            expect_rank(
                f"r{rnd}-span",
                phrase_topk(spark, ix, f"{a} {b}", k=k, cfg=cfg, slop=1, ordered=False).collect(),
                want_u,
            )

        # LM Dirichlet
        coll = sum(len(ts) for ts in toks.values())
        ttf = Counter(t for ts in toks.values() for t in ts)
        mu = rng.choice([500.0, 2000.0])
        lm = {}
        for d, ts in toks.items():
            tf = Counter(ts)
            s, hit = 0.0, False
            for t in dict.fromkeys(q_terms):
                if t in tf and t in ttf:
                    hit = True
                    pc = ttf[t] / coll
                    s += max(0.0, math.log(1 + tf[t] / (mu * pc)) + math.log(mu / (len(ts) + mu)))
            if hit:
                lm[d] = s
        want_lm = sorted(lm.items(), key=lambda x: (-x[1], x[0]))[:k]
        expect_rank(
            f"r{rnd}-lm",
            lm_dirichlet_topk(spark, ix, q, k=k, mu=mu, cfg=cfg).collect(),
            want_lm,
        )

        # boosting: demote docs containing a random negative term
        neg = rng.choice(vocab)
        nb = rng.choice([0.3, 0.5])
        want_b = sorted(
            (
                (d, s * nb if neg in toks[d] else s)
                for d, s in full
            ),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        expect_rank(
            f"r{rnd}-boosting",
            boosting_topk(spark, ix, q, neg, negative_boost=nb, k=k, cfg=cfg).collect(),
            want_b,
        )

        # regexp: char-class mutation of a sampled term, best-expansion BM25
        t0_ = rng.choice([t for t in vocab if len(t) >= 3])
        ci = rng.randrange(len(t0_))
        alt = rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
        pattern = t0_[:ci] + "[" + t0_[ci] + alt + "]" + t0_[ci + 1 :]
        rxp = re.compile("^" + pattern + "$")
        cand_rx = sorted(
            ((len(oix.postings[v][0]), v) for v in oix.postings if rxp.match(v)),
            key=lambda x: (-x[0], x[1]),
        )[:50]
        best_rx: dict[int, float] = {}
        for dfv, v in cand_rx:
            ids, tfs = oix.postings[v]
            w = float(np.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5)))
            for j2, d in enumerate(ids):
                tfv = float(tfs[j2])
                s = w * tfv / (tfv + 1.2 * (0.25 + 0.75 * len(toks[int(d)]) / avgdl))
                if s > best_rx.get(int(d), 0.0):
                    best_rx[int(d)] = s
        want_rx = sorted(best_rx.items(), key=lambda x: (-x[1], x[0]))[:k]
        expect_rank(
            f"r{rnd}-regexp",
            regexp_topk(spark, ix, pattern, k=k, cfg=cfg).collect(),
            want_rx,
        )

        # has_parent: children carry the conv rollup score of the round query
        if rnd % 3 == 0:
            pmode = rng.choice(["max", "sum"])
            groups: dict[str, list[float]] = {}
            for d, s in full:
                groups.setdefault(conv_of[d], []).append(s)
            aggf = {"max": max, "sum": sum}[pmode]
            ps = {c: aggf(ss) for c, ss in groups.items()}
            want_hp = sorted(
                ((d, ps[conv_of[d]]) for d in toks if conv_of[d] in ps),
                key=lambda x: (-x[1], x[0]),
            )[:k]
            expect_rank(
                f"r{rnd}-has_parent",
                has_parent_topk(spark, ix, q, k=k, score_mode=pmode, cfg=cfg).collect(),
                want_hp,
            )

        # match_phrase_prefix on the sampled real bigram: fixed=a, prefix
        # = first 2 chars of b (guaranteed >= 1 expansion with a match)
        pre = b[:2]
        cand_e = sorted(
            ((len(oix.postings[t][0]), t) for t in oix.postings if t.startswith(pre)),
            key=lambda x: (-x[0], x[1]),
        )
        exps = [t for _, t in cand_e[:8]]
        best_pp: dict[int, float] = {}
        for e in exps:
            fullseq = [a, e]
            for d, ts in toks.items():
                if not any(ts[j : j + 2] == fullseq for j in range(len(ts) - 1)):
                    continue
                s = 0.0
                for t in dict.fromkeys(fullseq):
                    ids, tfs = oix.postings[t]
                    j2 = int(ids.searchsorted(d))
                    tfv, dl = float(tfs[j2]), float(len(toks[d]))
                    s += float(
                        np.log(1.0 + (n - len(ids) + 0.5) / (len(ids) + 0.5))
                    ) * tfv / (tfv + 1.2 * (0.25 + 0.75 * dl / avgdl))
                if d not in best_pp or s > best_pp[d]:
                    best_pp[d] = s
        want_pp = sorted(best_pp.items(), key=lambda x: (-x[1], x[0]))[:k]
        expect_rank(
            f"r{rnd}-phrase_prefix",
            phrase_prefix_topk(
                spark, ix, f"{a} {pre}", k=k, cfg=cfg, max_expansions=8
            ).collect(),
            want_pp,
        )

        # constant_score: exact filter-context doc set, fixed boost
        cs_want = sorted(d for d, ts in toks.items() if set(q_terms) & set(ts))
        got_cs = constant_score_topk(
            spark, ix, q, k=len(docs) + 1, boost=1.5, cfg=cfg
        ).collect()
        checks += 1
        if [r.docid for r in got_cs] != cs_want or any(r.score != 1.5 for r in got_cs):
            mismatches += 1
            fails.append(f"r{rnd}-constant_score")

        # min_score: floor just under the 5th full score (ties included)
        if len(full) > 5:
            floor = full[4][1] - 1e-12
            want_f = [(d, s) for d, s in full if s >= floor][:k]
            expect_rank(
                f"r{rnd}-min_score",
                bm25_topk(
                    spark, ix, q, k=k, cfg=cfg, mode="pruned", min_score=floor
                ).collect(),
                want_f,
            )

        # match_bool_prefix: round terms + a sampled 2-char prefix clause
        if rnd % 2 == 0:
            pre2 = rng.choice([t for t in vocab if len(t) >= 2])[:2]
            exp_mb = [
                t
                for _, t in sorted(
                    ((len(oix.postings[t][0]), t) for t in oix.postings if t.startswith(pre2)),
                    key=lambda x: (-x[0], x[1]),
                )[:8]
            ]
            base_mb = dict(score_query(oix, " ".join(dict.fromkeys(q_terms)), k=len(docs)))
            best_mb: dict[int, float] = {}
            for e in exp_mb:
                for d, s in score_query(oix, e, k=len(docs)):
                    best_mb[d] = max(best_mb.get(d, 0.0), s)
            sc_mb = {
                d: base_mb.get(d, 0.0) + best_mb.get(d, 0.0)
                for d in set(base_mb) | set(best_mb)
            }
            want_mb = sorted(sc_mb.items(), key=lambda x: (-x[1], x[0]))[:k]
            expect_rank(
                f"r{rnd}-match_bool_prefix",
                match_bool_prefix_topk(
                    spark, ix, f"{q} {pre2}", k=k, cfg=cfg, max_expansions=8
                ).collect(),
                want_mb,
            )

        # span_first: the sampled bigram head within a random window
        if rnd % 2 == 1:
            endv = rng.choice([1, 2, 4])
            sf_docs = {d for d, ts in toks.items() if a in ts and ts.index(a) < endv}
            want_sf = [
                (d, s) for d, s in score_query(oix, a, k=len(docs)) if d in sf_docs
            ][:k]
            expect_rank(
                f"r{rnd}-span_first",
                span_first_topk(spark, ix, a, end=endv, k=k, cfg=cfg).collect(),
                want_sf,
            )

        # span_not: head term not within a window of the tail term
        if a != b and rnd % 2 == 0:
            prew, postw = rng.choice([(0, 0), (1, 1), (2, 0)])
            sn_docs = set()
            for d, ts in toks.items():
                ps = [j for j, x in enumerate(ts) if x == a]
                qs2 = [j for j, x in enumerate(ts) if x == b]
                if any(
                    not any(p - prew <= qq <= p + postw for qq in qs2) for p in ps
                ):
                    sn_docs.add(d)
            want_sn = [
                (d, s) for d, s in score_query(oix, a, k=len(docs)) if d in sn_docs
            ][:k]
            expect_rank(
                f"r{rnd}-span_not",
                span_not_topk(
                    spark, ix, a, b, pre=prew, post=postw, k=k, cfg=cfg
                ).collect(),
                want_sn,
            )

        # terms_set: per-doc threshold from the doc's own turn_idx
        if rnd % 3 == 1:
            fdict = dict(full)
            per_ts = {}
            for d, ts in toks.items():
                nm = sum(1 for t in set(q_terms) if t in ts)
                if nm and nm >= 1 + (turn_of[d] % 3):
                    per_ts[d] = fdict[d]
            want_ts = sorted(per_ts.items(), key=lambda x: (-x[1], x[0]))[:k]
            expect_rank(
                f"r{rnd}-terms_set",
                terms_set_topk(
                    spark, ix, q_terms, msm_expr="1 + pmod(turn_idx, 3)", k=k, cfg=cfg
                ).collect(),
                want_ts,
            )

    # msearch: one batch covering 10 random queries == 10 single runs
    batch = {f"q{i}": " ".join(rng.sample(vocab, 2)) for i in range(10)}
    multi = bm25_topk_multi(spark, ix, batch, k=10, cfg=cfg).collect()
    by_qid: dict[str, list] = {}
    for r in sorted(multi, key=lambda r: (r.qid, r.rank)):
        by_qid.setdefault(r.qid, []).append((r.docid, r.score))
    for qid, qq in batch.items():
        checks += 1
        want = score_query(oix, qq, k=10)
        got = by_qid.get(qid, [])
        if [d for d, _ in got] != [d for d, _ in want] or any(
            not math.isclose(g, w, abs_tol=1e-9) for (_, g), (_, w) in zip(got, want)
        ):
            mismatches += 1
            fails.append(f"msearch-{qid}")

    # search_after: pages 1+2 concatenated == top-2k, no overlap/gap
    q = " ".join(rng.sample(vocab, 3))
    p1 = bm25_topk(spark, ix, q, k=10, cfg=cfg, mode="pruned").collect()
    cur = (float(p1[-1].score), int(p1[-1].docid))
    p2 = bm25_topk(spark, ix, q, k=10, cfg=cfg, mode="pruned", after=cur).collect()
    checks += 1
    want = score_query(oix, q, k=20)
    got = [(r.docid, r.score) for r in [*p1, *p2]]
    if [d for d, _ in got] != [d for d, _ in want]:
        mismatches += 1
        fails.append("search_after")

    # multi_match best_fields / cross_fields over a text+tool multi-field
    # index on the same corpus, random queries mixing both vocabularies
    from mysql_es_spark.plans.multi_field import build_multi_field, multi_match_topk

    boosts = {"text": 1.0, "tool": 2.0}
    mf = os.path.join(tempfile.gettempdir(), "soak_r2_mf")
    shutil.rmtree(mf, ignore_errors=True)
    build_multi_field(spark, df, mf, boosts, cfg)
    tool_of = {
        r.docid: r.text
        for r in spark.read.parquet(f"{mf}/field=tool/forward")
        .select("docid", "text")
        .collect()
    }
    oix_tool = build_oracle_index(list(tool_of.items()))
    tool_vocab = sorted(oix_tool.postings)
    for i in range(6):
        qt = rng.sample(vocab, 1) + rng.sample(tool_vocab, 1)
        qq = " ".join(qt)
        per_field = {
            "text": dict(score_query(oix, qq, k=len(docs))),
            "tool": dict(score_query(oix_tool, qq, k=len(docs))),
        }
        tie = rng.choice([0.0, 0.3])
        comb: dict[int, float] = {}
        for d in set(per_field["text"]) | set(per_field["tool"]):
            ss = [boosts[f] * m[d] for f, m in per_field.items() if d in m]
            comb[d] = max(ss) + tie * (sum(ss) - max(ss))
        want_mm = sorted(comb.items(), key=lambda x: (-x[1], x[0]))[:10]
        expect_rank(
            f"mm{i}-best",
            multi_match_topk(
                spark, mf, qq, k=10, mtype="best_fields", tie_breaker=tie, cfg=cfg
            ).collect(),
            want_mm,
        )
        # cross_fields: per-term dis-max across fields, summed
        cross: dict[int, float] = {}
        for t in dict.fromkeys(qt):
            pt = {
                "text": dict(score_query(oix, t, k=len(docs))),
                "tool": dict(score_query(oix_tool, t, k=len(docs))),
            }
            for d in set(pt["text"]) | set(pt["tool"]):
                ss = [boosts[f] * m[d] for f, m in pt.items() if d in m]
                cross[d] = cross.get(d, 0.0) + max(ss) + tie * (sum(ss) - max(ss))
        want_cf = sorted(cross.items(), key=lambda x: (-x[1], x[0]))[:10]
        expect_rank(
            f"mm{i}-cross",
            multi_match_topk(
                spark, mf, qq, k=10, mtype="cross_fields", tie_breaker=tie, cfg=cfg
            ).collect(),
            want_cf,
        )

    # percolate: random stored queries vs set containment
    from mysql_es_spark.operators.percolate import percolate

    stored = []
    for i in range(8):
        mode = rng.choice(["all", "any"])
        nterms = rng.randint(1, 3)
        stored.append((f"sq{i}", " ".join(rng.sample(vocab, nterms)), mode))
    from pyspark.sql import functions as F

    pdocs = spark.read.parquet(f"{ix}/forward").select(
        F.col("docid").alias("doc_id"), "text"
    )
    got_pc = {
        (r.doc_id, r.query_id)
        for r in percolate(spark, pdocs, stored).collect()
    }
    want_pc = set()
    for d, ts in toks.items():
        tset = set(ts)
        for qid, qtext, mode in stored:
            qs = set(qtext.split())
            if (qs <= tset) if mode == "all" else bool(qs & tset):
                want_pc.add((d, qid))
    checks += 1
    if got_pc != want_pc:
        mismatches += 1
        fails.append(f"percolate: {len(got_pc ^ want_pc)} diffs")

    # collapse inner_hits: winners' groups expanded, ranks/order vs Python
    from mysql_es_spark.operators.query import bm25_collapse_topk, parent_id_topk

    role_of = {
        r.docid: r.role
        for r in spark.read.parquet(f"{ix}/forward").select("docid", "role").collect()
    }
    for i in range(6):
        q = " ".join(rng.sample(vocab, rng.randint(1, 3)))
        kg, nh = rng.choice([1, 2, 3]), rng.choice([1, 2, 4])
        full = score_query(oix, q, k=len(docs))
        per_g: dict[str, list] = {}
        for d, s in full:
            per_g.setdefault(role_of[d], []).append((d, round(s, 4)))
        ranked_g = {
            g: sorted(rows, key=lambda x: (-x[1], x[0])) for g, rows in per_g.items()
        }
        wins = sorted(
            ((rows[0][1], rows[0][0], g) for g, rows in ranked_g.items()),
            key=lambda x: (-x[0], x[1]),
        )[:kg]
        want_ih = set()
        for _, _, g in wins:
            for rk, (d, s) in enumerate(ranked_g[g][:nh], 1):
                want_ih.add((g, d, s, rk))
        got_ih = {
            (r.role, r.docid, round(r.score, 4), r.hit_rank)
            for r in bm25_collapse_topk(
                spark, ix, q, "role", k=kg, cfg=cfg, order_round=4, inner_hits=nh
            ).collect()
        }
        checks += 1
        if got_ih != want_ih:
            mismatches += 1
            fails.append(f"collapse_ih{i}: {len(got_ih ^ want_ih)} diffs")

    # terms lookup: term set from a synthetic lookup doc, constant-score set
    from mysql_es_spark.operators.query import terms_lookup_topk

    for i in range(4):
        lk_terms = rng.sample(vocab, rng.randint(1, 4))
        lk = spark.createDataFrame(
            [(1, " ".join(lk_terms)), (2, "decoy")], "lid long, text string"
        )
        got_tl = sorted(
            r.docid
            for r in terms_lookup_topk(
                spark, ix, lk, F.col("lid") == 1, k=len(docs) + 10, cfg=cfg
            ).collect()
        )
        want_tl = sorted(d for d, ts in toks.items() if set(lk_terms) & set(ts))
        checks += 1
        if got_tl != want_tl:
            mismatches += 1
            fails.append(f"terms_lookup{i}: {len(set(got_tl) ^ set(want_tl))} diffs")

    # parent_id: children of a random conv
    convs = sorted(set(conv_of.values()))
    for i in range(4):
        c = rng.choice(convs)
        got_pid = [r.docid for r in parent_id_topk(spark, ix, c, k=10_000).collect()]
        want_pid = sorted(d for d, cv in conv_of.items() if cv == c)
        checks += 1
        if got_pid != want_pid:
            mismatches += 1
            fails.append(f"parent_id{i}: got {len(got_pid)} want {len(want_pid)}")

    # random_sampler agg: md5-thresholded sample counts vs Python
    import hashlib

    from mysql_es_spark.operators.aggs import random_sampler_agg

    for i in range(3):
        q = " ".join(rng.sample(vocab, 2))
        p = rng.choice([0.25, 0.5, 0.75])
        seed = f"soak{i}"
        thr = int(round(p * 2**32))
        m_docs = {d for d, _ in score_query(oix, q, k=len(docs))}
        samp = [
            d
            for d in m_docs
            if int(hashlib.md5(f"{seed}:{conv_of[d]}".encode()).hexdigest()[:8], 16)
            % 2**32
            < thr
        ]
        row = random_sampler_agg(spark, ix, q, probability=p, seed=seed, cfg=cfg).collect()[0]
        checks += 1
        if row.n_sampled != len(samp) or row.doc_count != round(len(samp) / p):
            mismatches += 1
            fails.append(f"random_sampler{i}: {row.n_sampled} vs {len(samp)}")

    # dsir weights: hashed-unigram importance ratio vs Python
    from mysql_es_spark.operators.sampling import dsir_logweights

    for i in range(3):
        tgt_term = rng.choice(vocab)
        B = rng.choice([64, 256])
        bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B
        cr: Counter = Counter()
        ct: Counter = Counter()
        for d, ts in toks.items():
            is_t = tgt_term in ts
            for t in ts:
                b = bucket(t)
                cr[b] += 1
                if is_t:
                    ct[b] += 1
        tr, tt = sum(cr.values()), sum(ct.values())
        lw = {
            b: math.log((ct[b] + 1.0) / (tt + B)) - math.log((cr[b] + 1.0) / (tr + B))
            for b in cr
        }
        want_w = {
            d: round(sum(lw[bucket(t)] for t in ts), 4) if ts else 0.0
            for d, ts in toks.items()
        }
        pdf = spark.read.parquet(f"{ix}/forward").select(
            F.col("docid").alias("doc_id"), "text"
        )
        # target membership from the python tokenization, so both sides
        # agree on the exemplar set and only the weight math is under test
        got_w = {
            r.doc_id: round(r.dsir_logw, 4)
            for r in dsir_logweights(
                pdf,
                F.col("doc_id").isin([d for d, ts in toks.items() if tgt_term in ts]),
                n_buckets=B,
            ).collect()
        }
        checks += 1
        bad = sum(1 for d in want_w if abs(got_w.get(d, 1e9) - want_w[d]) > 1e-3)
        if bad:
            mismatches += 1
            fails.append(f"dsir{i}: {bad} docs off")

    # --- EQL sequence: engine vs brute maximal-start enumeration on the
    # real transcripts (conv_id key, role steps, ts/docid total order) ---
    import itertools

    from mysql_es_spark.operators.eql import sequence_matches

    ev_rows = spark.read.parquet(f"{ix}/forward").select(
        "docid", "conv_id", "role", "ts"
    ).collect()
    byconv: dict = {}
    for r in ev_rows:
        byconv.setdefault(r.conv_id, []).append((r.ts, r.docid, r.role))
    for evs in byconv.values():
        evs.sort()
    ev_df = spark.read.parquet(f"{ix}/forward").select("docid", "conv_id", "role", "ts")
    roles = ["user", "assistant", "tool"]
    for i in range(min(args.rounds, 6)):
        k_steps = rng.choice([2, 3])
        steps = [rng.choice(roles) for _ in range(k_steps)]
        maxspan = rng.choice([None, 3600.0, 86400.0])
        got = {
            (r.conv_id, r.start_ts, r.end_docid)
            for r in sequence_matches(
                ev_df, "conv_id", [f"role = '{st}'" for st in steps],
                tiebreak="docid", maxspan_seconds=maxspan,
            ).collect()
        }
        want = set()
        for conv, evs in byconv.items():
            for endpos in range(len(evs)):
                if evs[endpos][2] != steps[-1]:
                    continue
                best = None
                for chain in itertools.combinations(range(endpos + 1), k_steps - 1):
                    pos = list(chain) + [endpos]
                    if sorted(set(pos)) != pos:
                        continue
                    if any(evs[q][2] != steps[j] for j, q in enumerate(pos)):
                        continue
                    if best is None or evs[pos[0]][0] > best:
                        best = evs[pos[0]][0]
                if best is None:
                    continue
                span = (evs[endpos][0] - best).total_seconds()
                if maxspan is None or span <= maxspan:
                    want.add((conv, best, evs[endpos][1]))
        checks += 1
        if got != want:
            mismatches += 1
            fails.append(f"eql{i}: {len(got ^ want)} rows differ ({steps}, {maxspan})")

    # --- ES|QL: random pipe vs the manual DataFrame composition ---
    from mysql_es_spark.functions.esql import esql

    turns_df = spark.read.parquet(f"{ix}/forward").select(
        "docid", "conv_id", "role", "tool", "text"
    )
    for i in range(min(args.rounds, 6)):
        role = rng.choice(roles)
        pipe = (
            f'FROM t | WHERE role == "{role}" '
            f"| EVAL tl = length(text) "
            f"| STATS n = COUNT(*), mx = MAX(tl), total = SUM(tl) BY tool "
            f"| SORT tool"
        )
        got_rows = [tuple(r) for r in esql(pipe, {"t": turns_df}).collect()]
        want_rows = [
            tuple(r)
            for r in turns_df.filter(F.col("role") == role)
            .withColumn("tl", F.length("text"))
            .groupBy("tool")
            .agg(F.count("*").alias("n"), F.max("tl").alias("mx"), F.sum("tl").alias("total"))
            .orderBy(F.col("tool").asc_nulls_last())
            .collect()
        ]
        checks += 1
        if got_rows != want_rows:
            mismatches += 1
            fails.append(f"esql{i}: rows differ for role {role}")

    print(
        json.dumps(
            {
                "checks": checks,
                "mismatches": mismatches,
                "turns": args.turns,
                "docs": len(docs),
                "rounds": args.rounds,
                "fails": fails[:5],
            }
        )
    )
    return 0 if mismatches == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
