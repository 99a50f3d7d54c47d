#!/usr/bin/env python3
"""Build an ADVERSARIAL copy of an sf dir that exercises the
engine/oracle agreement OUTSIDE the generated data's domain:

  - documents gain rows containing vertical tab 0x0B (the byte where
    Java/Python `\\s` and RE2 `\\s` disagree) mixed with tabs/newlines
    -> exercises t2/t3/c1/f8 whitespace classes and f1/f5 `\\s*` gaps;
  - events gain pre-1970 rows (negative epoch micros) around week /
    hour / 30-min bucket boundaries -> exercises the floor-division
    forms in an16/e10/e3 (DuckDB's integer `//` TRUNCATES toward zero
    — verified on duckdb 1.0.0: -7 // 2 = -3 — so the oracle SQL must
    floor explicitly via the pmod construction, as the Spark side does);
  - documents gain a NULL-text row (the engine's excision/decontam
    operators coalesce text to '' for tokenization and pass the
    coalesced form through for untouched docs — the oracles' ELSE
    branch must coalesce identically, r9 review finding) and
    PERIODIC / keeper-overlap rows (self-overlapping duplicate
    windows: t31's excision must protect keeper spans — cover
    subtraction, not union — or the first occurrence dies too).

Usage (one command): scripts/hostile_gate.sh  — builds the fixture,
replays the canonical hostile query list (defined THERE) through
graft.Verify into a fresh temp dir, and oracle-compares. Manual form:
  python3 scripts/adversarial_fixture.py [src_sf_dir] [dst_dir]
  sbt "runMain graft.Verify <dst> /tmp/advout t2_quality_score,t3_token_count,c1_curate,f1_affiliation_split,f5_cleanup,f8_whitelist_clean,an16_cohort,e10_resample,e3_sliding_window,t28_exact_spans,t30_decontaminate_spans,t31_excise_duplicates,m1_binary_meta,m2_frame_sample,m3_image_meta,m4_audio_meta,m5_interleave,m6_media_dedup,m7_jpeg_meta,an28_exact_p99,e11_stream_tumbling,e17_stream_sliding,t35_url_canon,an31_regression,j12_interval_join,j11_asof_tolerance,j13_asof_forward,j14_asof_nearest,n19_knn_classify,t38_gopher_repetition,t39_ngram_novelty,t40_tokenizer_fertility,an33_bitmap_rollup,an34_retention,d16_cc_stars,sk3_hotcold_join,e19_stream_daily_distinct,an35_bitmap_overlap"
  python3 scripts/check_oracle.py <dst> /tmp/advout   # expect 38 pass / 0 fail

The m-family rows pin the null-text contract (engine coalesces text to
an EMPTY payload — a null-text doc must not NPE the typed maps — and
the oracles coalesce identically); an28 pins the NULLS LAST rank
order both engines must share. e11/e17 run the REAL watermarked
streams over the pre-epoch rows — the opt-in epoch shift (a window /
slide multiple) must recover the batch window starts exactly;
t35/an31/j12 pin the r9 late additions over the hostile doc ids;
the as-of family (j11 backward-tolerance, j13 forward, j14 nearest)
runs on the pre-epoch rows' NEGATIVE event-time micros — the directed
staleness arithmetic and both scan orders must hold below zero.
"""
import datetime
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/advfix"

shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in os.listdir(src):
    shutil.copy(os.path.join(src, f), dst)


def rewrite(name, fn):
    p = os.path.join(dst, name)
    t = pq.read_table(p)
    pq.write_table(fn(t), p)


def docs(t):
    d = t.to_pylist()
    proto = dict(d[0])
    mx = max(r["doc_id"] for r in d)
    texts = [
        "a\x0bb the of and",            # \x0b between word runs
        "lead\x0b\x0b trail\x0b",       # runs + trailing
        "the\x0bof\tand\nis a to in",   # every whitespace kind mixed
        "x,\x0bY",                      # \x0b right after the f1 comma
    ]
    # overlap-regime rows for the span operators (t28/t31): periodic
    # text (3 windows, 1 hash, only pos 1 is the keeper), and a
    # keeper-overlap pair — doc B's pos-1 window first appeared in
    # doc A while B's pos-6 window is the keeper for doc C's copy, so
    # B's excision must protect positions 6..15
    periodic = " ".join(["w"] * 12)
    ov_a = " ".join([f"x{i}" for i in range(1, 6)] + [f"c{i}" for i in range(1, 6)])
    ov_b = " ".join([f"x{i}" for i in range(1, 6)] + [f"c{i}" for i in range(1, 11)])
    ov_c = " ".join([f"c{i}" for i in range(1, 11)])
    texts += [periodic, ov_a, ov_b, ov_c]
    for i, txt in enumerate(texts):
        r = dict(proto)
        r["doc_id"] = mx + 1 + i
        r["text"] = txt
        r["n_chars"] = len(txt)
        d.append(r)
    # NULL text: the engine coalesces to '' for tokenization and emits
    # the coalesced form for untouched docs — oracle must match
    r = dict(proto)
    r["doc_id"] = mx + 1 + len(texts)
    r["text"] = None
    r["n_chars"] = 0
    d.append(r)
    return pa.Table.from_pylist(d, schema=t.schema)


def events(t):
    d = t.to_pylist()
    proto = dict(d[0])
    mx = max(r["event_id"] for r in d)
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    # boundary-adjacent negative micros: -1 (one tick before epoch),
    # exact -30min, one past a week, one past an hour, -2
    for i, us in enumerate([-1, -1800000000, -604800000001, -3600000001, -2]):
        r = dict(proto)
        r["event_id"] = mx + 1 + i
        r["ts"] = epoch + datetime.timedelta(microseconds=us)
        r["user_id"] = 10_000_000 + (i % 2)
        d.append(r)
    # NULL value: aggregates must null-skip identically on both engines
    # and an28's pinned NULLS LAST rank order must hold (Spark's asc
    # default would rank this row FIRST and shift every percentile pick)
    r = dict(proto)
    r["event_id"] = mx + 6
    r["value"] = None
    d.append(r)
    return pa.Table.from_pylist(d, schema=t.schema)


rewrite("documents.parquet", docs)
rewrite("events.parquet", events)
print(f"adversarial fixture written to {dst}")
