"""HTTP control plane: the reference's ``OlxServer`` route surface
(``OlxServer.scala:67-101``) re-expressed over :class:`JobRegistry`.

Routes (reference parity, minus the live-browser cluster):

- ``GET  /olx``      — the start form (``start.html``,
  ``OlxServer.scala:72-73``).
- ``GET  /olx/db``   — store browse page (``db.html``, ``:74-75``):
  here a live summary of each job's output store (documents per
  committed round) instead of a static page over H2.
- ``GET  /olx/run``  — running-jobs table (``runHtml``, ``:105-117``):
  one ``<tr>`` per job with (name, url, count, time) in the
  reference's cell order.
- ``POST /olx/run``  — form → ``Search`` via the S5/M6 semantics
  (``sources/jobs.py::search_from_form`` — first-value reads, Java
  ``toInt`` count, reject on missing name/count → 500 "Invalid form
  data", ``:80-97``). The reference substitutes the live Firefox URL
  when the form's url is empty (M9); that cluster is dropped
  (SURVEY.md §2.1), so an empty url is rejected loudly instead.
- ``POST /olx/stop`` — cooperative cancel of every job
  (``:99-106``): ``JobRegistry.stop_all`` stops each at its next
  round boundary with a complete checkpoint behind it (STRONGER than
  the reference's mid-stream fiber cancel — a stopped job resumes
  deterministically); responds like the reference (start page with a
  ``Location: /olx`` header).

Completed jobs remove themselves from the registry (D2), so the run
table empties as jobs finish — same observable behavior as the
reference's ``zeroAppState``.

The server owns NO Ray session (CLAUDE.md): the caller (CLI
``__main__`` below, or a test fixture) initialises Ray before
``start()``. Jobs run on registry threads; Ray tasks do the work.
"""

from __future__ import annotations

import datetime
import html
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

from .pipelines.registry import JobRegistry
from .sources.jobs import Search, search_from_form

_START_HTML = """<!doctype html><html><body>
<h1>olx_ray</h1>
<form method="post" action="/olx/run">
  name: <input name="name"> url: <input name="url">
  count: <input name="count"> <button>run</button>
</form>
<form method="post" action="/olx/stop"><button>stop all</button></form>
<p><a href="/olx/run">running jobs</a> | <a href="/olx/db">store</a></p>
</body></html>"""

_RUN_TEMPLATE = """<!doctype html><html><body>
<h1>running jobs</h1>
<table border="1">
<tr><th>name</th><th>url</th><th>count</th><th>time</th></tr>
[[JOBS]]
</table>
<p><a href="/olx">start</a></p>
</body></html>"""


class OlxControlServer:
    """start/serve/stop lifecycle around a :class:`JobRegistry`.

    ``make_job(search) -> (CrawlConfig, seeds_table)`` translates a
    validated form ``Search`` into a runnable crawl — the deployment
    decides pages_dir/out_dir; the server only owns HTTP + registry
    plumbing. ``port=0`` binds an ephemeral port (tests)."""

    def __init__(self, make_job, *, host: str = "127.0.0.1", port: int = 0,
                 now=None):
        self.registry = JobRegistry()
        self._make_job = make_job
        self._now = now or (lambda: datetime.datetime.now())
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet: tests/CLI print their own
                pass

            def _send(self, code: int, body: str,
                      headers: dict | None = None):
                raw = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(raw)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(raw)

            def do_GET(self):
                if self.path == "/olx":
                    self._send(200, _START_HTML)
                elif self.path == "/olx/run":
                    self._send(200, outer._run_html())
                elif self.path == "/olx/db":
                    self._send(200, outer._db_html())
                else:
                    self._send(404, "not found")

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                form = {k: v for k, v in
                        parse_qs(self.rfile.read(n).decode("utf-8"),
                                 keep_blank_values=True).items()}
                if self.path == "/olx/run":
                    code, body = outer._post_run(form)
                    self._send(code, body)
                elif self.path == "/olx/stop":
                    outer.registry.stop_all()
                    # reference parity: start page + Location header
                    self._send(200, _START_HTML, {"Location": "/olx"})
                else:
                    self._send(404, "not found")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)

    # ------------------------------------------------------------ routes
    def _post_run(self, form: dict) -> tuple[int, str]:
        search = search_from_form(form, now=self._now())
        if search is None:
            # reference: IO.fromOption(...)("Invalid form data") → 500
            return 500, "Invalid form data"
        if not search.url:
            # M9 (live-browser URL fallback) is dropped by design:
            # loud rejection instead of a silent browser dependency
            return 500, ("url is required: the live-browser URL "
                         "fallback (M9) is not part of this engine — "
                         "seeds must be explicit")
        cfg, seeds = self._make_job(search)
        job = self.registry.start(search.name, cfg, seeds)
        job.search = search          # for the run table's cells
        self._record_out_dirs()      # record out_dir before D2 removal
        return 200, self._run_html()

    def _run_html(self) -> str:
        rows = []
        for j in self.registry.jobs():
            s = getattr(j, "search", None)
            name = html.escape(j.name)
            url = html.escape(getattr(s, "url", None) or "")
            cnt = getattr(s, "download_ads_count", "")
            t = getattr(s, "time", "")
            rows.append(f"<tr><td>{name}</td><td>{url}</td>"
                        f"<td>{cnt}</td><td>{t}</td></tr>")
        return _RUN_TEMPLATE.replace("[[JOBS]]", "".join(rows))

    def _db_html(self) -> str:
        from pathlib import Path

        import pyarrow.parquet as pq

        from .state import checkpoint as ckpt

        parts = ["<!doctype html><html><body><h1>store</h1>"]
        for out_dir in sorted(self._record_out_dirs()):
            last = ckpt.latest_complete_round(out_dir)
            rounds = (last + 1) if last is not None else 0
            # footer row counts only — no Ray, no data scan
            n_docs = sum(
                pq.ParquetFile(f).metadata.num_rows
                for r in range(rounds)
                for f in Path(ckpt.round_dir(out_dir, r), "documents")
                .glob("**/*.parquet"))
            parts.append(f"<p>{html.escape(out_dir)}: rounds={rounds} "
                         f"documents={n_docs}</p>")
        parts.append("</body></html>")
        return "".join(parts)

    # --------------------------------------------------------- lifecycle
    def _record_out_dirs(self) -> set[str]:
        """Accumulate every out_dir ever started, so /olx/db keeps
        showing a job's store after D2 self-removal."""
        dirs = set(getattr(self, "_seen_out_dirs", set()))
        for j in self.registry.jobs():
            dirs.add(j.cfg.out_dir)
        self._seen_out_dirs = dirs
        return dirs

    @property
    def port(self) -> int:
        return self._httpd.server_port

    def start(self) -> "OlxControlServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        """Shut down HTTP AND cancel jobs (cooperative, checkpointed)."""
        self.registry.stop_all()
        self._httpd.shutdown()
        self._httpd.server_close()


def make_site_job_factory(pages_dir: str, out_root: str):
    """The standard ``make_job``: each Search crawls the given page
    store from its own url seed into ``out_root/<name>``, capped at its
    form count. Registry threads attach ``search`` for the run table."""
    import os

    import pyarrow as pa

    from .pipelines.crawl import CrawlConfig
    from .schema import SEEDS

    def make_job(search: Search):
        # no per-visit trace for server-launched crawls: the trace is a
        # test/debug aid whose read-back is O(total fetches) on the
        # driver; nothing in the route surface consumes it
        cfg = CrawlConfig(pages_dir=pages_dir,
                          out_dir=os.path.join(out_root, search.name),
                          collect_trace=False)
        seeds = pa.table({
            "search_id": pa.array([1], pa.int64()),
            "name": pa.array([search.name]),
            "url": pa.array([search.url]),
            "max_count": pa.array([search.download_ads_count], pa.int32()),
            "started_at": pa.array([search.time], pa.timestamp("us")),
        }, schema=SEEDS)
        return cfg, seeds

    return make_job


if __name__ == "__main__":
    import argparse
    import tempfile

    import ray

    ap = argparse.ArgumentParser(description="olx_ray HTTP control plane")
    ap.add_argument("--tier", default="t1")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from .sources.sitegen import SITE_VERSION, ensure_site

    site = ensure_site(args.tier, f"{tempfile.gettempdir()}/olx_ray_site_"
                                  f"{args.tier}_v{SITE_VERSION}")
    out = args.out or tempfile.mkdtemp(prefix="olx_ray_server_")
    srv = OlxControlServer(make_site_job_factory(site["pages"], out),
                           host=args.host, port=args.port).start()
    print(f"olx_ray control plane on http://{args.host}:{srv.port}/olx "
          f"(out={out}); Ctrl-C to stop")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
        ray.shutdown()
