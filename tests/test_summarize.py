"""X6/X7 goldens ported verbatim from summarizer_test.go / highlighter_test.go."""

from go_crawler_spark.functions.summarize import highlight, match_summary, scan_sentences


def test_scan_sentence_golden():
    inp = "Dot without space.Ending in ! Ending in $foo$.1 number at start or end 1. Question?"
    assert scan_sentences(inp) == [
        "Dot without space.",
        "Ending in !",
        " Ending in $foo$.",
        "1 number at start or end 1.",
        " Question?",
    ]


LOREM = """
Sed ut perspiciatis unde omnis iste natus error sit voluptatem accusantium
doloremque laudantium, totam rem aperiam, eaque ipsa quae ab illo inventore
veritatis et quasi architecto beatae vitae dicta sunt explicabo. Nemo enim
ipsam voluptatem quia voluptas KEYWORD1 sit aspernatur aut odit aut fugit, sed quia
consequuntur magni dolores eos qui ratione voluptatem sequi nesciunt. Neque
porro quisquam est, qui dolorem ipsum quia dolor sit amet, consectetur,
adipisci velit, sed quia non numquam eius modi tempora incidunt ut labore et
dolore magnam aliquam quaerat voluptatem. Ut enim ad KEYWORD2 minima veniam, quis
nostrum exercitationem ullam corporis suscipit laboriosam, nisi ut aliquid ex
ea commodi consequatur? Quis autem vel eum iure reprehenderit qui in ea
voluptate velit esse quam nihil molestiae consequatur, vel illum qui dolorem
eum fugiat quo voluptas nulla pariatur?"""

EXPECTED = """Nemo enim
ipsam voluptatem quia voluptas KEYWORD1 sit aspernatur aut odit aut fugit, sed quia
consequuntur magni ..... Ut enim ad KEYWORD2 minima veniam, quis
nostrum exercitationem ullam corporis suscipit laboriosam, nisi ut aliquid ex
ea commodi consequatur?."""


def test_match_summary_golden():
    assert match_summary(LOREM, "KEYWORD1 KEYWORD2", 256) == EXPECTED


def test_highlighter_golden():
    cases = [
        ("Test KEYWORD1", "Test <em>KEYWORD1</em>"),
        ("Data. KEYWORD2 lorem ipsum.KEYWORD1",
         "Data. <em>KEYWORD2</em> lorem ipsum.<em>KEYWORD1</em>"),
        ("no match", "no match"),
    ]
    for inp, exp in cases:
        assert highlight(inp, "KEYWORD1 KEYWORD2") == exp


def test_highlight_case_insensitive_and_quoted():
    assert highlight("keyword1 here", '"KEYWORD1"') == "<em>keyword1</em> here"
