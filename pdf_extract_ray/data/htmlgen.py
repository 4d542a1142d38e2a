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


HTML_GENERATORS = {
    "html_article": html_article,
    "html_linkfarm": html_linkfarm,
    "html_nested": html_nested,
    "html_malformed": html_malformed,
}
