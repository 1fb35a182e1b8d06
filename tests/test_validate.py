"""Validation/quarantine routing, health introspection, callback sink."""

from pyspark.sql import functions as F

from api_ocr_spark.operators import validate


def test_split_valid_media_by_fmt(spark):
    df = spark.createDataFrame(
        [("a", "png"), ("b", "jpg"), ("c", "exe"), ("d", "tiff"), ("e", "gif")],
        "media_ref string, fmt string",
    )
    valid, quarantine = validate.split_valid_media(df)
    assert {r.media_ref for r in valid.collect()} == {"a", "b", "d"}
    q = quarantine.collect()
    assert {r.media_ref for r in q} == {"c", "e"}
    assert all(r.reject_reason == "unsupported_format" for r in q)


def test_split_valid_media_by_extension(spark):
    df = spark.createDataFrame(
        [("scan1.jpeg",), ("scan2.PNG",), ("virus.exe",), ("doc.pdf",)],
        "media_ref string",
    )
    valid, quarantine = validate.split_valid_media(df)
    assert valid.count() == 3
    assert quarantine.count() == 1


def test_engine_health(spark):
    h = validate.engine_health(spark)
    assert h["status"] == "ok" and h["templates_loaded"]
    assert h["glyphs"] >= 40 and h["charset_size"] == h["glyphs"] + 1  # + space


def test_callback_sink(spark):
    import tempfile, os, glob, json

    df = spark.range(25).select(F.col("id").cast("string").alias("doc_id"))
    tmp = tempfile.mkdtemp()

    def cb(rows):
        # executor-side callback: persist to a shared dir (local-mode test)
        with open(os.path.join(tmp, f"{os.getpid()}_{rows[0]['doc_id']}.json"), "w") as f:
            json.dump(rows, f)

    sent = validate.callback_sink(df, cb, batch_size=10)
    assert sent == 25
    got = []
    for path in glob.glob(os.path.join(tmp, "*.json")):
        with open(path) as f:
            got.extend(json.load(f))
    assert {r["doc_id"] for r in got} == {str(i) for i in range(25)}
