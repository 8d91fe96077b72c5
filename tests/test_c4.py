"""C4 line-level cleaning — rule-by-rule goldens (Raffel et al. 2020)."""

import pytest
import pyspark.sql.functions as F

from go_crawler_spark.functions import c4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_rules_golden(spark):
    text = "\n".join([
        "This is a proper sentence with enough words.",   # kept
        "Too short here.",                                  # < 5 words
        "This line has plenty of words but no terminal punctuation",
        "Please enable JavaScript to view the comments.",  # javascript
        "Does a question mark terminate a line properly?", # kept
        'He said the quote ends like "this."',             # kept (quote)
        "   Leading spaces are trimmed before checking.  ",  # kept
    ])
    df = _docs(spark, [(1, text)])
    row = df.select(
        c4.c4_kept_lines_col(F.col("text")).alias("kept")
    ).collect()[0]
    assert row.kept == [
        "This is a proper sentence with enough words.",
        "Does a question mark terminate a line properly?",
        'He said the quote ends like "this."',
        "Leading spaces are trimmed before checking.",
    ]


def test_page_rules_golden(spark):
    good = "\n".join([
        "First sentence with a full stop right here.",
        "Second sentence is also long enough to count.",
        "Third sentence makes the page pass the gate.",
    ])
    df = _docs(spark, [
        (1, good),
        (2, good + "\nSome lorem ipsum filler text appears."),   # lorem
        (3, good + '\nvar x = { "json": 1 };'),                  # brace
        (4, "Only one proper sentence survives the cleaning."),  # < 3
    ])
    out = c4.c4_clean(df)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1].n_lines_kept == 3
    assert rows[1].n_sentences == 3
    assert rows[1].text == good


def test_sentence_count_runs(spark):
    df = _docs(spark, [(1, "Wait?! Really. Yes... sure.")])
    n = df.select(
        c4.c4_sentence_count_col(F.col("text")).alias("n")
    ).collect()[0].n
    # runs: "?!", ".", "...", "." -> 4
    assert n == 4


def test_cleaned_text_replaces_and_schema_preserved(spark):
    df = spark.createDataFrame(
        [(1, "Keep this full sentence, it has enough words.\nnope", "en")],
        "doc_id long, text string, lang string",
    )
    out = c4.c4_clean(df, min_sentences=1)
    row = out.collect()[0]
    assert row.text == "Keep this full sentence, it has enough words."
    assert row.lang == "en"
    assert out.columns == ["doc_id", "text", "lang",
                           "n_lines_kept", "n_sentences"]


def test_plan_is_zero_shuffle_python_free(spark):
    df = _docs(spark, [(1, "A sentence that is long enough to stay here.")])
    plan = c4.c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan
