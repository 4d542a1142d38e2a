"""HTML boilerplate-strip fallback tests (FIXTURES.md §F3)."""
from pdf_extract_ray.data.htmlgen import (html_article, html_linkfarm,
                                          html_malformed, html_nested)
from pdf_extract_ray.engine.html_extract import extract_html_text, sniff_payload


def test_article_keeps_main_drops_boilerplate():
    main = ("This is the long main body of the article with plenty of real "
            "sentences in it and the usual function words that mark prose.")
    out = extract_html_text(html_article(main))
    assert main in out
    assert "Home" not in out          # nav stripped
    assert "Copyright" not in out     # footer stripped
    assert "Sponsored" not in out     # aside stripped
    assert "var x" not in out         # script stripped


def test_linkfarm_yields_nothing():
    assert extract_html_text(html_linkfarm()) == ""


def test_nested_paragraphs_all_kept():
    paras = [
        "the first paragraph has a run of words that is long enough to keep",
        "and the second one is also made of the usual words in a sentence",
        "finally the third block of prose is here to stay in the output",
    ]
    out = extract_html_text(html_nested(paras + ["x"]))
    for p in paras:
        assert p in out
    assert "\nx" not in out  # the 1-word block is dropped


def test_malformed_does_not_raise():
    out = extract_html_text(html_malformed(
        "the words of this block are plain and are enough to be kept"))
    assert "the words of this block" in out


def test_entities_decoded():
    html = (b"<html><body><p>A &amp; B are the words of the sentence that "
            b"is long enough to keep here</p></body></html>")
    assert "A & B" in extract_html_text(html)


def test_non_utf8_no_crash():
    assert isinstance(extract_html_text(b"<html><body><p>\xff\xfe garbage "
                                        b"bytes</p></body></html>"), str)


class TestSniff:
    def test_pdf(self):
        assert sniff_payload(b"%PDF-1.4\n...") == "pdf"
        assert sniff_payload(b"\xef\xbb\xbf%PDF-1.7") == "pdf"

    def test_html(self):
        assert sniff_payload(b"<!DOCTYPE html><html>") == "html"
        assert sniff_payload(b"  <html lang='en'>") == "html"
        assert sniff_payload(b"<body>x</body>") == "html"

    def test_other(self):
        assert sniff_payload(b"") == "empty"
        assert sniff_payload(b"just some text") == "other"
        assert sniff_payload(bytes(64)) == "other"


class TestHtmlStructures:
    def test_table_cells_kept_when_prose(self):
        html = (b"<html><body><table><tr>"
                b"<td>this table cell holds a full sentence of real words "
                b"that should be kept in the output</td>"
                b"<td>so does the second cell with its own run of prose "
                b"about the topic at hand</td>"
                b"</tr></table></body></html>")
        from pdf_extract_ray.engine.html_extract import extract_html_text
        out = extract_html_text(html)
        assert "full sentence of real words" in out
        assert "second cell" in out

    def test_comments_and_cdata_ignored(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        html = (b"<html><body><!-- a comment with words in it -->"
                b"<p>the visible paragraph is here and long enough to be "
                b"kept by the scorer</p></body></html>")
        out = extract_html_text(html)
        assert "visible paragraph" in out
        assert "a comment" not in out

    def test_lists_kept(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        items = "".join(
            f"<li>item {i} of the list is a sentence with several words"
            f"</li>" for i in range(3))
        html = f"<html><body><ul>{items}</ul></body></html>".encode()
        out = extract_html_text(html)
        for i in range(3):
            assert f"item {i} of the list" in out

    def test_style_attribute_noise(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        html = (b"<html><body><div style='color: red; font-size: 12px'>"
                b"the styled block keeps its words because the style lives "
                b"in the attribute not the text</div></body></html>")
        out = extract_html_text(html)
        assert "styled block keeps its words" in out
        assert "font-size" not in out


def test_table_cells_are_blocks():
    from pdf_extract_ray.data.htmlgen import html_table
    prose = ("the words of this cell are plain prose and long enough to be "
             "kept by the scorer")
    out = extract_html_text(html_table(prose, n_rows=2))
    assert out.count(prose) == 2      # each prose td is its own kept block
    assert "ID0" not in out           # terse label cells dropped
    assert "home" not in out          # nav stripped


def test_comments_and_cdata_never_leak():
    from pdf_extract_ray.data.htmlgen import html_comments_cdata
    prose = "a plain sentence with enough of the usual words to be kept"
    out = extract_html_text(html_comments_cdata(prose))
    assert prose in out
    assert f"{prose} second" in out
    assert "boilerplate comment" not in out
    assert "cdata payload" not in out
    assert "hidden" not in out        # script content (even CDATA-wrapped)


def test_char_references_decoded():
    from pdf_extract_ray.data.htmlgen import html_entities
    out = extract_html_text(html_entities())
    assert "café" in out              # named entity
    assert "M&M" in out               # &amp;
    assert "—" in out            # decimal reference
    assert "☃" in out            # hex reference


def test_inline_links_kept_below_density_threshold():
    from pdf_extract_ray.data.htmlgen import html_inline_links
    out = extract_html_text(html_inline_links(
        "a sentence of common words that runs on"))
    assert "inline link" in out       # anchor text preserved in-place
    assert "running prose" in out


class TestFastTokenizerParity:
    """The fast HTML tokenizer must be EVENT-IDENTICAL to
    html.parser (convert_charrefs=True) on everything it does not bail
    on; bailing re-parses with the stdlib so outputs can never diverge."""

    class _Rec:
        def __init__(self):
            self.ev = []

        def handle_data(self, d):
            self.ev.append(("d", d))

        def handle_starttag(self, t, a):
            self.ev.append(("s", t))

        def handle_endtag(self, t):
            self.ev.append(("e", t))

    @staticmethod
    def _coalesce(ev):
        out = []
        for k, v in ev:
            if k == "d" and out and out[-1][0] == "d":
                out[-1] = ("d", out[-1][1] + v)
            else:
                out.append((k, v))
        return out

    def _diff(self, doc: str):
        from html.parser import HTMLParser

        from pdf_extract_ray.engine import html_extract as hx
        fast = self._Rec()
        try:
            hx._fast_feed(fast, doc)
        except hx._FastBail:
            return None  # bail is always safe (stdlib reparse)

        rec = self._Rec()

        class P(HTMLParser):
            def handle_data(self, d):
                rec.handle_data(d)

            def handle_starttag(self, t, a):
                rec.handle_starttag(t, a)

            def handle_endtag(self, t):
                rec.handle_endtag(t)

        p = P(convert_charrefs=True)
        p.feed(doc)
        p.close()
        a, b = self._coalesce(fast.ev), self._coalesce(rec.ev)
        return None if a == b else (doc[:120], a[:8], b[:8])

    EDGES = [
        '<p>abc &am', '<p>abc &amp', 'tail &', 'a<b', 'x</>y',
        '<p>A&nbsp;B</p>', '<script>if(a<b){}</script>ok',
        '<div a="x>y">z', '<!doctype html><p>t', '<!-- c --><p>u',
        '<? pi ?><p>v', '<![CDATA[w]]><p>q', '<script>xyz',
        '<!-- unterminated', '<!x>t', '<![if ie]>t', '<p foo>u',
        '<P Foo=Bar>v</P >', '</p attr>w', '<p>&#65;&#x42;</p>',
        '<p>&unknownent;x', '<style>a{}</STYLE >b',
        '<script>a</script x>b</script>c', '<p\nclass="x">nl',
        '<p a = "x" / >y', '<p a==b>c', '<p foo=>x', '<br/>',
        '<a href=x/>y', '<p/ >z', '<p a / b>w', '<div a="x<b">c',
        "<p a='y'>d", '<p>&amp;&lt;&gt;</p>', '<<p>>', '<', '<p', '</',
        '<!', '<!>', '<?', '<p title="a&amp;b">t', '<><', 'x<', 'x&',
    ]

    def test_edge_cases_event_identical(self):
        fails = [d for d in (self._diff(c) for c in self.EDGES) if d]
        assert not fails, fails

    def test_mutated_corpus_event_identical(self):
        import random

        from pdf_extract_ray.data import htmlgen as hg
        base = [
            hg.html_article("main content sentence here " * 30).decode(),
            hg.html_linkfarm().decode(),
            hg.html_malformed("malformed body text " * 10).decode(),
            hg.html_comments_cdata("visible text " * 12).decode(),
            hg.html_entities().decode(),
        ]
        rng = random.Random(17)
        fails = []
        for _ in range(2000):
            dl = list(rng.choice(base))
            for _ in range(rng.randint(1, 8)):
                op = rng.randint(0, 2)
                pos = rng.randrange(max(1, len(dl)))
                if op == 0 and dl:
                    dl[pos % len(dl)] = rng.choice('<>&"\'/=! abczé;')
                elif op == 1:
                    dl.insert(pos, rng.choice(
                        ['<', '>', '&amp;', '</', '<!--', '<script>',
                         '&#', '"', '<![', '<?', '-->', '/>']))
                elif op == 2 and len(dl) > 2:
                    del dl[pos % len(dl)]
            d = self._diff("".join(dl))
            if d:
                fails.append(d)
        assert not fails, fails[:3]

    def test_extract_output_identical_fast_vs_stdlib(self):
        from pdf_extract_ray.data import htmlgen as hg
        from pdf_extract_ray.engine import html_extract as hx
        docs = [
            hg.html_article("Hello world main content sentence. " * 25),
            hg.html_linkfarm(),
            hg.html_nested(["para one long enough to keep " * 6,
                            "two " * 30]),
            hg.html_malformed("some malformed body text " * 10),
            hg.html_table("cell content words " * 8),
            hg.html_comments_cdata("visible main text " * 15),
            hg.html_entities(),
            hg.html_inline_links("link heavy text " * 10),
        ]
        fast = [hx.extract_html_text(d) for d in docs]
        orig = hx._fast_feed

        def bail(seg, s):
            raise hx._FastBail()

        hx._fast_feed = bail
        try:
            slow = [hx.extract_html_text(d) for d in docs]
        finally:
            hx._fast_feed = orig
        assert fast == slow


class TestCharsetSniffing:
    def test_declared_cp1251_decodes(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        # >= 120 chars so the long-block rule applies (the short-block
        # stopword heuristic is English-specific by frozen design)
        body = "Привет мир, это тестовый абзац достаточной длины чтобы " \
               "пройти фильтр плотности текста в извлекателе контента " \
               "без англоязычных стоп-слов в принципе."
        html = ('<html><head><meta charset="windows-1251"></head>'
                '<body><p>' + body + '</p></body></html>') \
            .encode("cp1251")
        out = extract_html_text(html)
        assert "Привет мир" in out

    def test_lying_charset_never_raises(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        html = (b'<meta charset="utf-16"><p>' + b"\xff\xfe\x00garbage" * 40
                + b"</p>")
        extract_html_text(html)  # total: no exception

    def test_unknown_charset_falls_back(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        body = ("plain ascii body long enough to score as content " * 5)
        html = ('<meta charset="no-such-codec-xyz"><p>' + body
                + "</p>").encode()
        out = extract_html_text(html)
        assert "plain ascii body" in out

    def test_utf8_unaffected(self):
        from pdf_extract_ray.engine.html_extract import extract_html_text
        body = "déjà vu — unicode paragraph with plenty of words " * 5
        html = ('<meta charset="utf-8"><p>' + body + "</p>").encode()
        assert "déjà vu" in extract_html_text(html)
