"""htmlparse: DOM building, CSS-subset selection, Jsoup text semantics."""

from olx_ray.functions import htmlparse as hp


def sel_text(html, css):
    return hp.text(hp.select(hp.parse_html(html), css))


def test_select_attr_value():
    h = "<div data-cy='ad_title'>Привіт світ</div><div data-cy='other'>no</div>"
    assert sel_text(h, "div[data-cy='ad_title']") == "Привіт світ"


def test_select_id_and_child_chain():
    h = ("<div id='mainContent'><ul><li><p>a:b</p></li><li><p>c</p></li></ul>"
         "<ol><li>x</li></ol></div><ul><li><p>outside</p></li></ul>")
    els = hp.select(hp.parse_html(h), "div#mainContent ul>li>p")
    assert [e.text() for e in els] == ["a:b", "c"]


def test_select_double_attr():
    h = ("<div data-testid='l-card' data-cy='l-card'><a href='/x'>t</a></div>"
         "<div data-testid='l-card'><a href='/y'>t</a></div>")
    els = hp.select(hp.parse_html(h), "div[data-testid='l-card'][data-cy='l-card'] a")
    assert [e.attrs["href"] for e in els] == ["/x"]


def test_empty_selection_text_and_attr():
    doc = hp.parse_html("<div>hi</div>")
    assert hp.text(hp.select(doc, "div[data-cy='ad_title']")) == ""
    assert hp.attr(hp.select(doc, "a[data-cy='nope']"), "href") == ""


def test_multi_match_text_space_joined():
    h = "<div data-cy='ad_title'>Перший</div><div data-cy='ad_title'>Другий</div>"
    assert sel_text(h, "div[data-cy='ad_title']") == "Перший Другий"


def test_whitespace_normalization_and_nesting():
    h = "<div data-cy='ad_title'><h4>  Про\n\tдам   диван </h4></div>"
    assert sel_text(h, "div[data-cy='ad_title']") == "Про дам диван"


def test_inline_vs_block_boundaries():
    assert hp.parse_html("<div>Hello<b>World</b></div>").text() == "HelloWorld"
    assert hp.parse_html("<div><p>One</p><p>Two</p></div>").text() == "One Two"
    assert hp.parse_html("<div>a<br>b</div>").text() == "a b"


def test_attr_first_element_wins():
    h = "<a data-cy='p' data-testid='p' href='/first'>x</a><a data-cy='p' data-testid='p' href='/second'>y</a>"
    els = hp.select(hp.parse_html(h), "a[data-cy='p'][data-testid='p']")
    assert hp.attr(els, "href") == "/first"


def test_empty_attr_value():
    h = "<a data-cy='pagination-forward' data-testid='pagination-forward' href=''>next</a>"
    els = hp.select(hp.parse_html(h), "a[data-cy='pagination-forward'][data-testid='pagination-forward']")
    assert hp.attr(els, "href") == ""


def test_void_and_unclosed_tags():
    h = "<div><img src='a.jpg'><img src='b.jpg'></div><ul><li>one<li>two</ul>"
    doc = hp.parse_html(h)
    assert [e.attrs["src"] for e in hp.select(doc, "img")] == ["a.jpg", "b.jpg"]
    assert [e.text() for e in hp.select(doc, "ul>li")] == ["one", "two"]


def test_descendant_combinator_depth():
    h = "<div id='a'><section><ul><li><p>deep</p></li></ul></section></div>"
    assert [e.text() for e in hp.select(hp.parse_html(h), "div#a ul>li>p")] == ["deep"]


def test_attr_selector_value_with_space():
    """A quoted attribute value containing a space must stay one token
    (the documented [attr='val'] surface, not just the reference's
    space-free selectors)."""
    from olx_ray.functions import htmlparse as hp

    doc = hp.parse_html(
        "<div data-cy='ad title'><span>x</span></div>"
        "<div data-cy='other'>y</div>")
    hits = hp.select(doc, "div[data-cy='ad title']")
    assert len(hits) == 1
    assert hp.select(doc, "div[data-cy='ad title'] > span")


def test_script_style_excluded_from_text():
    """Jsoup Element.text() excludes script/style payloads (DataNodes)."""
    from olx_ray.functions import htmlparse as hp

    doc = hp.parse_html(
        "<div data-cy='t'>Title<script>var x=1;</script>"
        "<style>.a{color:red}</style> tail</div>")
    el = hp.select(doc, "div[data-cy='t']")[0]
    assert el.text() == "Title tail"


def test_self_closed_nonvoid_stays_open():
    """HTML5/Jsoup ignore the slash on non-void tags: <div/> OPENS."""
    from olx_ray.functions import htmlparse as hp

    doc = hp.parse_html("<div data-cy='t'/>inside</div><p>after</p>")
    assert hp.select(doc, "div[data-cy='t']")[0].text() == "inside"
    # void self-closers stay leaves
    doc2 = hp.parse_html("<p>a<br/>b</p>")
    assert hp.select(doc2, "p")[0].text() == "a b" or \
        hp.select(doc2, "p")[0].text() == "ab"


def test_li_implied_close_across_inline():
    """<li>a<b>x<li>b: the second li closes the first ACROSS the
    dangling inline <b> — both li are ul children, and a child-chain
    selector still reaches their <p> content."""
    from olx_ray.functions import htmlparse as hp

    doc = hp.parse_html(
        "<div id='mainContent'><ul><li><p>k1:v1</p>"
        "<b>dangling<li><p>k2:v2</p></ul></div>")
    ps = hp.select(doc, "div#mainContent ul>li>p")
    assert [p.text() for p in ps] == ["k1:v1", "k2:v2"]
    # but never across a NESTED list boundary
    doc2 = hp.parse_html("<ul><li>outer<ul><li>inner</ul></li></ul>")
    lis = hp.select(doc2, "ul>li")
    assert len(lis) == 2
