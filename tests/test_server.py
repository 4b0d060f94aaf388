"""HTTP control plane (olx_ray/server.py) — the reference OlxServer
route surface over JobRegistry: form → job, run table, D2
self-removal, stop-all with the reference's Location header, store
browse page."""

import os
import time
import urllib.error
import urllib.request
from urllib.parse import urlencode


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), dict(e.headers)


def _post(port, path, form):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=urlencode(form, doseq=True).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), dict(e.headers)


def test_control_plane_end_to_end(ray_session, tmp_root):
    from olx_ray.server import OlxControlServer, make_site_job_factory
    from olx_ray.sources.sitegen import SITE_VERSION, SiteSpec, ensure_site

    site = ensure_site("t1", os.path.join(tmp_root,
                                          f"srv_site_v{SITE_VERSION}"))
    out_root = os.path.join(tmp_root, "srv_out")
    srv = OlxControlServer(
        make_site_job_factory(site["pages"], out_root)).start()
    try:
        port = srv.port
        # start form + empty run table
        code, body, _ = _get(port, "/olx")
        assert code == 200 and "/olx/run" in body
        code, body, _ = _get(port, "/olx/run")
        assert code == 200 and "<tr><td>" not in body

        # invalid form (S5 semantics): missing count → 500, no job
        code, body, _ = _post(port, "/olx/run", {"name": "bad", "url": "x"})
        assert code == 500 and "Invalid form data" in body
        # Java-toInt reject: non-decimal count → same 500
        code, body, _ = _post(port, "/olx/run",
                              {"name": "bad", "url": "x", "count": "1_0"})
        assert code == 500
        # M9 dropped: empty url rejected loudly (reference asked the
        # live browser)
        code, body, _ = _post(port, "/olx/run",
                              {"name": "j", "url": "  ", "count": "5"})
        assert code == 500 and "url is required" in body
        assert not srv.registry.jobs()

        # valid job: runs the real t1 crawl, shows in the run table with
        # the reference's (name, url, count, time) cells
        seed = SiteSpec("t1").listing(0).url
        code, body, _ = _post(port, "/olx/run",
                              {"name": "job1", "url": seed, "count": "5"})
        assert code == 200 and "job1" in body and seed in body

        # D2: the completed job removes itself from the registry
        deadline = time.monotonic() + 120
        while srv.registry.jobs() and time.monotonic() < deadline:
            time.sleep(0.5)
        assert not srv.registry.jobs(), "job did not complete/self-remove"
        code, body, _ = _get(port, "/olx/run")
        assert "job1" not in body

        # store page: footer-count of the documents actually written
        code, body, _ = _get(port, "/olx/db")
        assert code == 200 and "documents=" in body
        n = int(body.split("documents=")[1].split("<")[0])
        assert n == 5            # capped by the form count

        # stop-all: reference parity — start page + Location header
        code, body, headers = _post(port, "/olx/stop", {})
        assert code == 200 and headers.get("Location") == "/olx"
        assert "/olx/run" in body

        # 404 surface
        code, _, _ = _get(port, "/nope")
        assert code == 404
    finally:
        srv.stop()


def test_stop_cancels_running_job(ray_session, tmp_root):
    """POST /olx/stop on a RUNNING job: cooperative cancel at a round
    boundary, complete checkpoint behind it (E3 — stronger than the
    reference's fiber cancel)."""
    from olx_ray.server import OlxControlServer, make_site_job_factory
    from olx_ray.sources.sitegen import SITE_VERSION, SiteSpec, ensure_site
    from olx_ray.state import checkpoint as ckpt

    site = ensure_site("t2", os.path.join(tmp_root,
                                          f"srv_site2_v{SITE_VERSION}"))
    out_root = os.path.join(tmp_root, "srv_out2")
    srv = OlxControlServer(
        make_site_job_factory(site["pages"], out_root)).start()
    try:
        seed = SiteSpec("t2").listing(0).url
        code, _, _ = _post(srv.port, "/olx/run",
                           {"name": "long", "url": seed, "count": "400"})
        assert code == 200 and srv.registry.jobs()
        code, _, headers = _post(srv.port, "/olx/stop", {})
        assert code == 200 and headers.get("Location") == "/olx"
        assert not srv.registry.jobs()
        # whatever ran is fully checkpointed → resumable
        last = ckpt.latest_complete_round(os.path.join(out_root, "long"))
        assert last is None or last >= 0
    finally:
        srv.stop()
