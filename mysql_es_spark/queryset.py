"""The reference query set (FIXTURES.md §3) — fixed, checked in.

40 queries over the synthetic Zipf vocabulary: 10 single-term (5 head /
5 tail ranks), 15 two-term, 10 three-to-five-term, 5 unicode/case/accent
variants exercising the fold chain (template.json analyzers T1/T2). Used
by the rank-identity tests and the benchmark.
"""

QUERY_SET: list[str] = [
    # -- 10 single-term: 5 head ranks, 5 tail ranks
    "w0",
    "w1",
    "w2",
    "w5",
    "w9",
    "w4300",
    "w8921",
    "w15000",
    "w23456",
    "w31007",
    # -- 15 two-term
    "w0 w1",
    "w0 w17",
    "w2 w9",
    "w3 w120",
    "w5 w77",
    "w8 w450",
    "w10 w11",
    "w12 w900",
    "w1 w2500",
    "w4 w33",
    "w6 w210",
    "w7 w98",
    "w13 w1300",
    "w20 w21",
    "w15 w666",
    # -- 10 three-to-five-term
    "w0 w1 w2",
    "w3 w4 w5",
    "w1 w10 w100",
    "w2 w20 w200 w2000",
    "w5 w50 w500",
    "w0 w7 w77 w777",
    "w9 w90 w900 w9000",
    "w11 w22 w33 w44 w55",
    "w6 w66 w660",
    "w8 w18 w28 w38 w48",
    # -- 5 unicode/case/accent variants (fold to plain tokens)
    "W0 W1",
    "CafÉ w0",
    "naïve w2",
    "résumé w5",
    "ÜBER w9",
]
