"""Job ingestion (S5/M6), proxy sources (S6/S7/M7/M8), registry (T1/E3),
metrics/export (A4/K4)."""

import datetime
import os
import time

import pytest

from olx_ray.sources.jobs import search_from_form, seeds_from_forms
from olx_ray.sources.proxies import (decode_last_checked, elite_https,
                                     parse_proxy_table, read_proxies_csv)

NOW = datetime.datetime(2024, 12, 20, 12, 0, 0)


# ------------------------------------------------------------- jobs (S5)
def test_search_from_form_reference_semantics():
    s = search_from_form({"name": ["диван"], "url": ["  https://x/l "],
                          "count": ["25"]}, now=NOW)
    assert (s.name, s.url, s.download_ads_count) == ("диван", "https://x/l", 25)
    # missing name or bad count → rejected (package.scala:26-29)
    assert search_from_form({"url": ["u"], "count": ["5"]}) is None
    assert search_from_form({"name": ["n"], "count": ["5x"]}) is None
    assert search_from_form({"name": ["n"], "count": ["5.0"]}) is None
    # url optional (None allowed), first value of multi-valued field wins
    s2 = search_from_form({"name": ["a", "b"], "count": ["1", "9"]}, now=NOW)
    assert s2.name == "a" and s2.download_ads_count == 1 and s2.url is None


def test_seeds_from_forms_monotone_ids():
    t = seeds_from_forms([
        {"name": ["a"], "url": ["https://h/1"], "count": ["5"]},
        {"name": ["bad"]},                                   # rejected
        {"name": ["c"], "count": ["7"]},                     # no url → rejected
        {"name": ["d"], "url": ["https://h/2"], "count": ["9"]},
    ], now=NOW)
    assert t["search_id"].to_pylist() == [1, 2]
    assert t["name"].to_pylist() == ["a", "d"]
    assert t["max_count"].to_pylist() == [5, 9]


# ---------------------------------------------------------- proxies (S6/7)
PROXY_HTML = """
<div class='fpl-list'><table>
<tr><th>IP</th><th>Port</th></tr>
<tr><td>1.2.3.4</td><td>8080</td><td>UA</td><td>Ukraine</td>
    <td>elite proxy</td><td>no</td><td>yes</td><td>3 mins ago</td></tr>
<tr><td>5.6.7.8</td><td>3128</td><td>DE</td><td>Germany</td>
    <td>anonymous</td><td>no</td><td>yes</td><td>1 hour ago</td></tr>
<tr><td>bad</td><td>notaport</td><td></td><td></td><td></td><td></td><td></td><td></td></tr>
<tr><td>9.9.9.9</td><td>80</td><td>FR</td><td>France</td>
    <td>elite proxy</td><td>yes</td><td>no</td><td>2 days ago</td></tr>
</table></div>
"""


def test_parse_proxy_table():
    t = parse_proxy_table(PROXY_HTML)
    assert t.num_rows == 3  # bad-port row skipped; header row has no td
    assert t["ip_address"].to_pylist() == ["1.2.3.4", "5.6.7.8", "9.9.9.9"]
    assert t["port"].to_pylist() == [8080, 3128, 80]


def test_decode_last_checked_sign_bug():
    # reference M7 bug: ages are ADDED to now (FreeProxy.scala:62-67)
    got = decode_last_checked("3 mins ago", NOW)
    assert got == NOW + datetime.timedelta(minutes=3)
    assert decode_last_checked("3 mins ago", NOW, fixed=True) \
        == NOW - datetime.timedelta(minutes=3)
    # compound: "1 hour 30 mins ago"
    assert decode_last_checked("1 hour 30 mins ago", NOW) \
        == NOW + datetime.timedelta(hours=1, minutes=30)


def test_elite_https_filter_and_csv(ray_session, tmp_path):
    import ray.data as rd

    t = parse_proxy_table(PROXY_HTML)
    kept = elite_https(rd.from_arrow(t)).to_pandas()
    assert kept["ip_address"].tolist() == ["1.2.3.4"]  # elite AND https==yes
    # S7: csv round-trip with explicit schema
    csv_path = str(tmp_path / "proxies.csv")
    with open(csv_path, "w") as f:
        for row in t.to_pylist():
            f.write(",".join(str(row[k]) for k in
                             ("ip_address", "port", "code", "country",
                              "anonymity", "google", "https", "last_checked"))
                    + "\n")
    ds = read_proxies_csv(csv_path)
    assert ds.count() == 3
    assert ds.schema().names[0] == "ip_address"


# ----------------------------------------------------- registry (T1/E3)
@pytest.fixture(scope="module")
def site_t2(ray_session, tmp_root):
    from olx_ray.sources.sitegen import write_site

    return write_site("t2", os.path.join(tmp_root, "site_t2_reg"))


def test_registry_start_stop_resume(ray_session, site_t2, tmp_root):
    from olx_ray.pipelines.crawl import CrawlConfig, crawl_native, read_documents
    from olx_ray.pipelines.registry import JobRegistry
    from olx_ray.sources.sitegen import SiteSpec

    out = os.path.join(tmp_root, "reg_job")
    reg = JobRegistry()
    cfg = CrawlConfig(pages_dir=site_t2["pages"], out_dir=out)
    job = reg.start("t2-job", cfg, SiteSpec("t2").seed_rows())
    assert reg.jobs() and reg.jobs()[0].name == "t2-job"
    time.sleep(3)
    reg.stop_all()          # E3: cooperative cancel at a round boundary
    assert not reg.jobs()   # D2: removed on completion/stop

    # resume after stop → identical to an uninterrupted run
    cfg2 = CrawlConfig(pages_dir=site_t2["pages"], out_dir=out, resume=True)
    crawl_native(cfg2, SiteSpec("t2").seed_rows())
    ref_out = os.path.join(tmp_root, "reg_ref")
    crawl_native(CrawlConfig(pages_dir=site_t2["pages"], out_dir=ref_out),
                 SiteSpec("t2").seed_rows())
    a = read_documents(out).sort(["round", "fetched_seq"]).take_all()
    b = read_documents(ref_out).sort(["round", "fetched_seq"]).take_all()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_metrics_and_csv_export(ray_session, site_t2, tmp_root):
    from olx_ray.pipelines.crawl import CrawlConfig, crawl_native
    from olx_ray.pipelines.metrics import (export_documents_csv, host_stats,
                                           round_stats, seen_stats)
    from olx_ray.sources.sitegen import SiteSpec

    out = os.path.join(tmp_root, "metrics_job")
    crawl_native(CrawlConfig(pages_dir=site_t2["pages"], out_dir=out),
                 SiteSpec("t2").seed_rows())
    hs = host_stats(out).to_pandas()
    assert "www.olx.ua" in set(hs["host"])
    assert "hub.olx.ua" in set(hs["host"])       # native mode reaches hot host
    assert set(hs["action"]) >= {"fetch_listing", "fetch_ad"}
    rs = round_stats(out)
    assert rs and rs[0]["round"] == 0 and "n_fetched" in rs[0]
    ss = seen_stats(out)
    assert len(ss) == 8 and all(s["n_items"] > 0 for s in ss)
    csv_dir = os.path.join(tmp_root, "docs_csv")
    export_documents_csv(out, csv_dir)
    assert any(f.endswith(".csv") for f in os.listdir(csv_dir))


def test_java_to_int_unicode_decimal_digits():
    """Java Integer.parseInt accepts Unicode Nd digits (Character.digit)
    and rejects superscripts — so must the engine."""
    from olx_ray.sources.jobs import _java_to_int

    assert _java_to_int("١٢٣") == 123  # Arabic-Indic 123
    assert _java_to_int("²") is None             # superscript two
    assert _java_to_int("-42") == -42
    assert _java_to_int("1_2") is None


def test_proxy_port_range_and_fpl_class_on_table():
    import datetime

    from olx_ray.sources.proxies import decode_last_checked, parse_proxy_table

    def mk(port):
        tds = ["1.2.3.4", str(port), "UA", "Ukraine", "elite proxy",
               "no", "yes", "1 min ago"]
        return "<tr>" + "".join(f"<td>{c}</td>" for c in tds) + "</tr>"

    # class on the TABLE element itself (reference selects by class,
    # element-agnostic) + overflow/invalid ports skipped, valid kept
    html = ("<table><tr><td>nav</td></tr></table>"
            f"<table class='fpl-list'>{mk(8080)}{mk(99999999999)}{mk(70000)}</table>")
    t = parse_proxy_table(html)
    assert t["port"].to_pylist() == [8080]
    assert t["ip_address"].to_pylist() == ["1.2.3.4"]

    # Scala-Duration unit aliases: "1 hr ago" is 3600 s, not 0
    now = datetime.datetime(2020, 1, 1)
    assert (decode_last_checked("1 hr ago", now, fixed=True)
            == now - datetime.timedelta(hours=1))
    assert (decode_last_checked("2 h ago", now, fixed=True)
            == now - datetime.timedelta(hours=2))
