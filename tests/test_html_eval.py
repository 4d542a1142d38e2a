"""HTML extraction-quality eval (VERDICT r3 item 7): labeled fixture
classes grade engine/html_extract.py's block scorer with informative
(non-saturated) precision/recall."""
import os

import pandas as pd
import pytest


def _entry(tag):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"entry_htmleval_{tag}", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class TestLabeledPages:
    def test_class_behavior_by_construction(self):
        from collections import Counter

        from pdf_extract_ray.data.htmlgen import labeled_page
        from pdf_extract_ray.engine.html_extract import extract_html_text
        n, k = Counter(), Counter()
        for d in range(40):
            html, parts = labeled_page(d)
            text = extract_html_text(html)
            for cls, m in parts:
                n[cls] += 1
                k[cls] += m in text
        # structural boilerplate must never leak
        assert k["boiler_nav"] == 0
        assert k["boiler_linkfarm"] == 0
        # long prose must always survive
        assert k["content_long"] == n["content_long"]
        # graded classes: semantic boilerplate leaks (precision signal),
        # stopword-free short content drops (recall signal)
        assert k["boiler_semantic"] == n["boiler_semantic"]
        assert k["content_short"] == n["content_short"] // 2

    def test_markers_unique_and_deterministic(self):
        from pdf_extract_ray.data.htmlgen import labeled_page
        a1, p1 = labeled_page(7)
        a2, p2 = labeled_page(7)
        assert a1 == a2 and p1 == p2
        ms = [m for _, m in p1]
        assert len(set(ms)) == len(ms)


@pytest.mark.usefixtures("ray_session")
class TestHtmlExtractEvalQuery:
    def test_report_thresholds(self):
        m = _entry("q")
        out = m.queries()["html_extract_eval"](
            "/root/testdata/sf0.001").set_index("name")
        assert out.loc["content_long", "ppm"] == 1_000_000
        assert out.loc["boiler_nav", "ppm"] == 0
        assert out.loc["boiler_linkfarm", "ppm"] == 0
        # graded: informative, bounded away from both 0 and 1
        assert 400_000 <= out.loc["content_short", "ppm"] <= 600_000
        prec = out.loc["precision", "ppm"]
        rec = out.loc["recall", "ppm"]
        f1 = out.loc["f1", "ppm"]
        assert 600_000 <= prec < 1_000_000
        assert 700_000 <= rec < 1_000_000
        assert 650_000 <= f1 < 1_000_000
        # exact harmonic-mean identity on the integer values
        assert f1 == (2 * prec * rec) // (prec + rec)
