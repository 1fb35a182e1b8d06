"""Image-caption pair mining (operators/captions.py): exact argmax rule,
tie-break, and candidate structure on crafted interleaved docs.

CHUNK_WORDS=8, MEDIA_MOD=3 — doc_id=3 puts media spans at offsets 0, 3, 6
with text neighbors everywhere except offset 0's left edge."""

from pyspark.sql import functions as F

from api_ocr_spark.operators.captions import caption_pairs


def _doc(chunks):
    return " ".join(" ".join(c) for c in chunks)


def test_caption_pairs_argmax_and_tiebreak(spark):
    # doc 3: seven 8-word chunks; media at 0, 3, 6
    w = lambda p, n: [f"{p}{i}" for i in range(n)]  # noqa: E731
    shared = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    chunks = [
        shared + ["m0a", "m0b"],          # 0 media
        shared + ["t1a", "t1b"],          # 1 text: 6/10 overlap with chunk0
        w("u", 8),                        # 2 text: disjoint from chunk3
        ["p", "q", "r", "s"] + w("m3", 4),  # 3 media
        ["p", "q", "r", "s"] + w("t4", 4),  # 4 text: 4/12 overlap with chunk3
        w("v", 8),                        # 5 text: disjoint from chunk6
        w("z", 8),                        # 6 media (last chunk, no next)
    ]
    docs = spark.createDataFrame([(3, _doc(chunks))], "doc_id bigint, text string")
    got = {r.media_ref: r for r in caption_pairs(docs).collect()}
    assert set(got) == {"m-3-0", "m-3-3", "m-3-6"}

    # offset 0: only the next span exists and shares 6 tokens
    r0 = got["m-3-0"]
    assert r0.caption_offset == 1 and r0.score_num == 6 and r0.score_den == 10

    # offset 3: next (4/12) beats prev (0/16)
    r3 = got["m-3-3"]
    assert r3.caption_offset == 4
    assert (r3.score_num, r3.score_den) == (4, 12)
    assert r3.caption == " ".join(chunks[4])

    # offset 6: only prev exists, zero overlap still yields the pair
    r6 = got["m-3-6"]
    assert r6.caption_offset == 5 and r6.score_num == 0 and r6.score_den == 16


def test_caption_pairs_tie_prefers_earlier_offset(spark):
    # media at offset 3; prev and next tie exactly (same 4-token overlap,
    # same union size) -> the preceding span must win
    shared = ["p", "q", "r", "s"]
    chunks = [
        ["f0" + str(i) for i in range(8)],   # 0 text (padding)
        ["f1" + str(i) for i in range(8)],   # 1 text
        shared + ["a1", "a2", "a3", "a4"],   # 2 text: 4/12 vs chunk3
        shared + ["mm1", "mm2", "mm3", "mm4"],  # 3 media
        shared + ["b1", "b2", "b3", "b4"],   # 4 text: 4/12 vs chunk3
    ]
    docs = spark.createDataFrame([(3, _doc(chunks))], "doc_id bigint, text string")
    rows = {r.media_ref: r for r in caption_pairs(docs).collect()}
    r3 = rows["m-3-3"]
    assert (r3.score_num, r3.score_den) == (4, 12)
    assert r3.caption_offset == 2  # tie -> earlier offset


def test_caption_pairs_schema_and_bounds(spark, sf_dir):
    from api_ocr_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    out = caption_pairs(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "media_ref", "caption_offset", "caption",
        "score_num", "score_den"]
    rows = out.collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.media_ref not in seen  # one winning caption per media span
        seen.add(r.media_ref)
        assert 0 <= r.score_num <= r.score_den <= 16
        d, o = r.media_ref[2:].rsplit("-", 1)
        assert r.doc_id == d
        assert abs(r.caption_offset - int(o)) == 1  # adjacency
