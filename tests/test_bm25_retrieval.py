"""Retrieval operators (operators/retrieval) — positional phrase match."""

def test_phrase_match_semantics(spark):
    from api_ocr_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(1, "the cat sat on the cat mat"),
         (2, "cat cat cat"),
         (3, "mat the cat")],
        "doc_id long, text string")
    phrases = spark.createDataFrame(
        [(1, "the cat"), (2, "cat cat"), (3, "dog"), (4, "cat mat the")],
        "phrase_id long, phrase string")
    got = {(r.doc_id, r.phrase_id, r.start)
           for r in retrieval.phrase_match(docs, phrases).collect()}
    assert got == {
        (1, 1, 0), (1, 1, 4),          # 'the cat' twice in doc 1
        (2, 2, 0), (2, 2, 1),          # overlapping 'cat cat' both found
        (3, 1, 1),
        # no 'dog'; no 'cat mat the' (doc 1 ends 'cat mat')
    }
