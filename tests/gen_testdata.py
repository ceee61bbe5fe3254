"""Alternate-seed synthetic testdata generator.

The driver regenerates /root/testdata each round with its own seed, and
twice now a query that passed local parity failed on the driver's roll
(round-1 proj_compute, round-2 fn_math/llm_seq_packing).  This script
builds a SECOND fixture set with the same schemas/shapes but a different
seed — plus adversarial rows the driver's generator may or may not emit
(multi-space / leading / trailing-space / single-word texts, boundary
balances) — so the full parity suite can run on two independent rolls
before the driver sees the code.

    python tests/gen_testdata.py /tmp/alt_testdata [seed]
    python tests/gen_testdata.py /tmp/sf1_soak 1 --scale 1000   # sf1 shape

``--scale N`` multiplies the sf0.001 row counts (default 10 = the
driver's sf0.01 shape; 1000 = sf1: lineitem 6M / orders 1.5M /
events 1M).  The large-scale rolls exist to soak the exact-integer
statistics recipes against their documented int64 budgets (VERDICT r7
#9) — overflow cliffs like agg_cohens_d's n·S₂ at ~7e4 rows/class are
invisible at sf0.01.

Never writes to /root/testdata (read-only driver property).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE = 10  # ~sf0.01 shape: 10x the sf0.001 row counts

VOCAB = (
    "the a spark join filter sort merge window batch stream table scan "
    "query row column value data key hash agg group order part line "
    "customer small big fast slow vector dup"
).split()

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "login", "error"]
LANGS = ["en", "es", "de", "fr", "zh"]


def _dec2(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def _ts_us(dates):
    return pa.array(dates.astype("datetime64[us]"))


def _ts_ns(dates):
    return pa.array(dates.astype("datetime64[ns]"))


def gen(
    out: str,
    seed: int = 20260813,
    ns_events: bool = False,
    ns_dates: bool = False,
    nulls: bool = False,
    ties: bool = False,
    flat_emb: bool = False,
    scale: int = SCALE,
) -> None:
    rng = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)

    def write(name, table):
        # cap row groups at 50k rows: pyarrow's 1Mi-row default makes a
        # 500k-row sf1 table ONE unsplittable row group, serializing
        # every scan onto a single task (round-9 scaling audit — the
        # grade-scale dirs are unaffected, they fit one group anyway)
        pq.write_table(
            table, os.path.join(out, f"{name}.parquet"),
            row_group_size=50_000,
        )

    # region / nation
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": [f"REGION_{i}" for i in range(5)],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_supp = 10 * scale
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": _dec2(rng, -999.99, 9999.99, n_supp),
    }))

    n_cust = 150 * scale
    bal = _dec2(rng, -999.99, 9999.99, n_cust)
    # adversarial: exact boundary balances the rounding sweeps care about
    bal[: 6] = [0.0, 500.0, -0.01, 499.99, 500.01, 2.5]
    write("customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": bal,
        "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
    }))

    # p_type/p_brand/p_name follow the driver's compact domains (p_type is
    # a single word <=8 chars — the implied-decimal fixture layout packs it
    # into an 8-byte field; names include 'gear' for the q9/q20 filters)
    n_part = 200 * scale
    adjs = np.array(["old", "small", "cold", "hot", "blue", "red", "big"])
    nouns = np.array(["ring", "anvil", "plate", "gear", "bolt", "rod"])
    write("part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [
            f"{a} {b}"
            for a, b in zip(
                adjs[rng.randint(0, len(adjs), n_part)],
                nouns[rng.randint(0, len(nouns), n_part)],
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, n_part)],
        "p_type": [
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STD"][i]
            for i in rng.randint(0, 6, n_part)
        ],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": _dec2(rng, 900, 2000, n_part),
    }))

    n_ord = 1500 * scale
    base = np.datetime64("1995-01-01")
    odates = base + rng.randint(0, 2500, n_ord).astype("timedelta64[D]")
    o_custkey = rng.randint(1, n_cust + 1, n_ord).tolist()
    o_prio = [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)]
    if nulls:
        # driver rolls may inject NULLs the local generator never did —
        # every r1-r3 red was a data shape local rolls lacked
        for j in range(0, 10, 2):
            o_prio[j] = None
        for j in range(1, 11, 2):
            o_custkey[j] = None
    write("orders", pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(o_custkey, pa.int64()),
        "o_orderstatus": [["O", "F", "P"][i] for i in rng.randint(0, 3, n_ord)],
        "o_totalprice": _dec2(rng, 1000, 500000, n_ord),
        "o_orderdate": _ts_ns(odates) if ns_dates else _ts_us(odates),
        "o_orderpriority": o_prio,
    }))

    n_li = 6000 * scale
    lkeys = rng.randint(1, n_ord + 1, n_li)
    lkeys.sort()
    linenum = np.ones(n_li, dtype=np.int32)
    for i in range(1, n_li):
        linenum[i] = linenum[i - 1] + 1 if lkeys[i] == lkeys[i - 1] else 1
    sdates = base + rng.randint(0, 2500, n_li).astype("timedelta64[D]")
    l_qty = _dec2(rng, 1, 50, n_li).tolist()
    if nulls:
        for j in range(0, 10, 2):  # NULL measures (aggregates skip them
            l_qty[j] = None        # identically — prove it)
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(rng.randint(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(l_qty, pa.float64()),
        "l_extendedprice": _dec2(rng, 900, 100000, n_li),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 4),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 4),
        "l_returnflag": [["R", "A", "N"][i] for i in rng.randint(0, 3, n_li)],
        "l_linestatus": [["O", "F"][i] for i in rng.randint(0, 2, n_li)],
        "l_shipdate": _ts_ns(sdates) if ns_dates else _ts_us(sdates),
    }))

    n_ev = 1000 * scale
    ev_ts = (
        np.datetime64("2024-01-01T00:00:00", "us")
        + rng.randint(0, 30 * 24 * 3600 * 10**6, n_ev).astype("timedelta64[us]")
    )
    if ns_events:
        # some driver fixture generations write events.ts as
        # TIMESTAMP(NANOS); exercise tables.load_table's nanos path
        ev_ts_arr = pa.array(ev_ts.astype("datetime64[ns]"))
    else:
        ev_ts_arr = pa.array(ev_ts)
    props = [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)]
    ev_val = _dec2(rng, 0.01, 330, n_ev).tolist()
    if nulls:
        for j in range(0, 10, 2):
            props[j] = None
        for j in range(1, 11, 2):
            ev_val[j] = None
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ev_ts_arr,
        "user_id": pa.array(rng.randint(0, 15, n_ev), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.randint(0, 5, n_ev)],
        "value": pa.array(ev_val, pa.float64()),
        "props": props,
    }))

    n_doc = 500 * scale
    texts = []
    for i in range(n_doc):
        n_words = rng.randint(8, 111)
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), n_words)]
        t = " ".join(words)
        texts.append(t)
    # adversarial text shapes the driver's roll may or may not contain:
    texts[0] = "word"                      # single token
    texts[1] = "double  space  inside"     # empty tokens mid-string
    texts[2] = " leading space"            # empty first token
    texts[3] = "trailing space "           # empty last token
    texts[4] = "the the the the the the the the the the the the"  # all dup
    texts[5] = "a " * 199 + "a"            # long, maximal stopword hits
    # exact duplicates for the dedup family
    for j in range(6, 26, 2):
        texts[j + 1] = texts[j]
    doc_ids = list(range(n_doc))
    langs = [LANGS[i] for i in rng.randint(0, 5, n_doc)]
    if ties:
        # VERDICT r4 #7: power-of-two lang groups whose integer sums land
        # EXACTLY on 4th-decimal rounding ties (avg = k + 1/32 = k.03125
        # -> x10000 = ...2.5): round-half-even vs floor(x+0.5) is a coin
        # flip per group, so any oracle pair that slips back to round()
        # instead of the snap discipline splits here deterministically.
        def tie_text(n_tok: int, n_char: int) -> str:
            body = "a " * (n_tok - 1)
            assert n_char > len(body)
            return body + "b" * (n_char - len(body))

        langs = [["en", "es", "de"][i % 3] for i in range(n_doc)]
        # zh: n=32, sum_chars % 32 == 1, sum_tokens % 32 == 1
        for k, j in enumerate(range(100, 132)):
            langs[j] = "zh"
            texts[j] = tie_text(10, 100) if k < 31 else tie_text(11, 37)
        # fr: n=64, sum_chars % 64 == 2, sum_tokens % 64 == 2
        for k, j in enumerate(range(140, 204)):
            langs[j] = "fr"
            texts[j] = tie_text(10, 100) if k < 63 else tie_text(12, 102)
    if nulls:
        # classes every driver red so far has hidden in: NULLs, empty
        # strings, multibyte/astral chars, duplicate doc_ids
        for j in range(30, 40, 2):
            texts[j] = None
        for j in range(41, 51, 2):
            langs[j] = None
        texts[52] = ""                          # empty string, not NULL
        texts[53] = "naïve café übergröße"      # 2-byte UTF-8
        texts[54] = "emoji 😀 pair 🎉 end"       # astral (4-byte UTF-8)
        texts[55] = "汉字 没有 空格 测试"          # CJK tokens
        texts[56] = None
        langs[56] = None                        # NULL text AND lang
        for j in range(60, 70, 2):              # dup doc_id, same text
            doc_ids[j + 1] = doc_ids[j]
            texts[j + 1] = texts[j]
        for j in range(70, 80, 2):              # dup doc_id, different text
            doc_ids[j + 1] = doc_ids[j]
    write("documents", pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": pa.array(
            [len(t) if t is not None else None for t in texts], pa.int64()
        ),
    }))

    n_vec = 500 * scale
    emb = rng.standard_normal((n_vec, 64)).astype(np.float32)
    # planted near-duplicates for the cosine-dup family
    for j in range(0, 40, 4):
        emb[j + 1] = emb[j] + rng.standard_normal(64).astype(np.float32) * 0.01
    if flat_emb:
        # degenerate vectors (VERDICT r6 #7): CONSTANT components hit
        # the mx == mn branch of llm_embedding_quantize; exact
        # duplicates tie every cosine rank.  Values stay nonzero so
        # norms never vanish (an all-zero vector is a data bug, not a
        # supported input — cosine is undefined there).
        for k, j in enumerate(range(100, 112)):
            emb[j] = np.float32(0.25 * (k + 1))   # constant vector
        for j in range(120, 130, 2):
            emb[j + 1] = emb[j]                   # exact duplicate pair
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v.tolist() for v in emb], pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_vec), pa.int32()),
    }))
    print(f"wrote alt testdata (seed={seed}) to {out}")


USAGE = (
    "usage: python tests/gen_testdata.py [OUT_DIR] [SEED] "
    "[--scale N] [--ns-events] [--ns-dates] [--nulls] [--ties] "
    "[--flat-emb]"
)


def parse_argv(argv: list) -> dict:
    """Parse the CLI.  Any unrecognized ``-``-prefixed token is an
    ERROR, never an output path — round 10 committed a 4.3 MB parquet
    directory literally named ``--help/`` because a typo'd flag fell
    through to the positional OUT_DIR slot (VERDICT r10 finding #1)."""
    flags = {"--ns-events", "--ns-dates", "--nulls", "--ties", "--flat-emb"}
    argv = list(argv)
    scale = SCALE
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = int(argv[i + 1])
        del argv[i : i + 2]
    opts = {f.lstrip("-").replace("-", "_"): (f in argv) for f in flags}
    args = [a for a in argv if a not in flags]
    bad = [a for a in args if a.startswith("-")]
    if bad:
        raise SystemExit(
            f"unrecognized option(s): {' '.join(bad)}\n{USAGE}"
        )
    return {
        "out": args[0] if args else "/tmp/alt_testdata",
        "seed": int(args[1]) if len(args) > 1 else 20260813,
        "scale": scale,
        **opts,
    }


if __name__ == "__main__":
    if "--help" in sys.argv or "-h" in sys.argv:
        raise SystemExit(USAGE)
    p = parse_argv(sys.argv[1:])
    gen(
        p["out"],
        p["seed"],
        ns_events=p["ns_events"],
        ns_dates=p["ns_dates"],
        nulls=p["nulls"],
        ties=p["ties"],
        flat_emb=p["flat_emb"],
        scale=p["scale"],
    )
