"""Deterministic synthetic HTML generators (FIXTURES.md §F3)."""
from __future__ import annotations


def html_article(main_text: str, title: str = "A Page") -> bytes:
    """nav boilerplate + one high-density main block + footer; the expected
    extraction is the main block (+ any long paragraphs)."""
    return f"""<!DOCTYPE html>
<html><head><title>{title}</title>
<style>body {{ margin: 0 }}</style>
<script>var x = 1;</script>
</head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<header><h1>{title}</h1></header>
<div id="main">
<p>{main_text}</p>
</div>
<aside><a href="/ad1">Sponsored thing</a> <a href="/ad2">Other ad</a></aside>
<footer>Copyright 2024 Example Corp. <a href="/tos">Terms</a></footer>
</body></html>""".encode()


def html_linkfarm() -> bytes:
    links = " ".join(f'<a href="/l{i}">link number {i}</a>' for i in range(40))
    return f"""<html><body><div>{links}</div></body></html>""".encode()


def html_nested(paras) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (f"<html><body><nav><a href='/'>home</a></nav>"
            f"<div class='content'><div>{body}</div></div>"
            f"<footer>foot</footer></body></html>").encode()


def html_malformed(text: str) -> bytes:
    return (f"<html><body><p>{text} & some <b>unclosed markup"
            f"<div><p>more {text}").encode()


def html_table(cell_text: str, n_rows: int = 3) -> bytes:
    """Data table: every <td> is its own block (BLOCK_TAGS includes td).
    Long prose cells survive the block scorer; terse label cells (under 3
    words) are dropped — the behavior a data-heavy page exercises."""
    rows = "".join(
        f"<tr><td>ID{r}</td><td>{cell_text} row {r}</td></tr>"
        for r in range(n_rows))
    return (f"<html><body><nav><a href='/'>home</a></nav>"
            f"<table>{rows}</table>"
            f"<footer>generated</footer></body></html>").encode()


def html_comments_cdata(text: str) -> bytes:
    """Comments and CDATA sections: html.parser routes them to
    handle_comment/handle_unknown_decl, which the segmenter ignores —
    neither may leak into the extraction."""
    return (f"<html><body>"
            f"<!-- boilerplate comment that must never appear -->"
            f"<p>{text}</p>"
            f"<![CDATA[ raw cdata payload must not leak ]]>"
            f"<script>/*<![CDATA[*/ var hidden = 1; /*]]>*/</script>"
            f"<p>{text} second</p>"
            f"<!-- trailing comment --></body></html>").encode()


def html_entities() -> bytes:
    """Character references: convert_charrefs=True must decode named,
    decimal and hex entities inside kept blocks."""
    return (b"<html><body><p>The caf&eacute; serves M&amp;M and a dash "
            b"&#8212; plus the hex form &#x2603; of the snowman in this "
            b"long enough sentence of plain words</p></body></html>")


def html_inline_links(text: str) -> bytes:
    """Prose paragraph with moderate inline anchors: link density stays
    under the 0.33 threshold so the block survives WITH the anchor text."""
    return (f"<html><body><p>{text} with an <a href='/x'>inline link</a> "
            f"inside the running prose of this paragraph which otherwise "
            f"keeps enough plain words to stay</p></body></html>").encode()


HTML_GENERATORS = {
    "html_article": html_article,
    "html_linkfarm": html_linkfarm,
    "html_nested": html_nested,
    "html_malformed": html_malformed,
    "html_table": html_table,
    "html_comments_cdata": html_comments_cdata,
    "html_entities": html_entities,
    "html_inline_links": html_inline_links,
}


# -- labeled quality-eval corpus (VERDICT r3 item 7) -------------------------

_EVAL_STOP_SENT = ("this is the part of the page that a reader would "
                   "actually want to keep because it has the full story "
                   "and all of the useful words in it")
_EVAL_COOKIE = ("We use cookies and similar technologies to improve your "
                "experience on this site and to show personalised adverts "
                "please accept our policy to continue reading the page")


def labeled_page(doc_id: int):
    """Deterministic labeled page for the extraction-quality eval:
    -> (html_bytes, parts) with parts = [(part_class, marker), ...].
    Each text part carries a unique marker token; the eval checks which
    markers survive `extract_html_text`.

    Classes (graded by construction, so P/R are informative):
    - content_long    long prose paragraph — MUST be kept (density rule)
    - content_short   short paragraph; even doc_ids get stopword-rich
                      prose (kept via the linguistic rule), odd get
                      stopword-free jargon (expected MISS -> recall < 1)
    - boiler_nav      nav/footer/aside structural boilerplate — MUST drop
    - boiler_linkfarm link-dense div — MUST drop (link-density rule)
    - boiler_semantic long cookie-banner prose in a plain div —
                      structurally indistinguishable from content
                      (expected FALSE POSITIVE -> precision < 1)
    """
    d = int(doc_id)
    parts = []

    def mk(i):
        return f"mkz{d}x{i}"

    m0, m1, m2, m3, m4, m5 = (mk(i) for i in range(6))
    parts.append(("content_long", m0))
    parts.append(("content_short", m1))
    parts.append(("boiler_nav", m2))
    parts.append(("boiler_linkfarm", m3))
    parts.append(("boiler_semantic", m4))
    parts.append(("content_long", m5))
    if d % 2 == 0:
        short = f"<p>Please read the {m1} notes before you go on</p>"
    else:
        short = f"<p>Xqz {m1} vvv qqq zzz</p>"
    links = " ".join(f'<a href="/l{i}">item {i} {m3}</a>'
                     for i in range(12))
    html = f"""<!DOCTYPE html>
<html><head><title>Eval {d}</title><script>var x={d};</script></head>
<body>
<nav><a href="/">Home {m2}</a> <a href="/a">About {m2}</a></nav>
<div id="main">
<p>{_EVAL_STOP_SENT} {m0} and even more of the same style of prose
so the block stays clearly over the length threshold for keeping</p>
{short}
<div class="cookie">{_EVAL_COOKIE} {m4} with quite a few more plain
words so this banner is as long as a real paragraph of content</div>
<p>{_EVAL_STOP_SENT} {m5} closing paragraph of the article with the
same healthy mix of common words and normal length</p>
</div>
<div class="farm">{links}</div>
<footer>Copyright 2024 {m2} Example Corp <a href="/tos">Terms</a>
</footer>
</body></html>"""
    return html.encode(), parts
