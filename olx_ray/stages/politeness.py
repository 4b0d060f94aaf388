"""Per-host politeness gates: robots.txt rules + crawl-delay token clocks.

North-rule requirement (no reference analog — the reference is
accidentally polite by being strictly sequential,
``DownloadAds.scala:26-28``). Gates are plain Ray actors (shared
mutable clock state is the one thing the Dataset API can't express,
SURVEY.md §4.2): hosts route to gate ``hash64(host) % n_gates`` so
every fetcher talks to the same gate for a given host and the per-host
serialization is global, not per-fetcher.

``acquire(host, n)`` reserves ``n`` fetch slots and returns the
simulated wait (seconds) the caller must add before issuing them — a
token-bucket advance of the host's clock by ``n * crawl_delay``.
Robots rules come from the synthetic page store's robots rows
(``Disallow`` prefix matching, ``Crawl-delay``).

CLOCK OWNERSHIP: the gate actor reads ``time.monotonic()`` itself.
Caller-supplied timestamps would mix monotonic clocks from different
worker PROCESSES — and on a multi-node cluster monotonic values from
different NODES differ by arbitrary offsets (each counts from its own
boot), so a cross-node comparison can sleep for days or silently skip
delays. All arithmetic against a host's clock happens inside the one
actor that owns it."""

from __future__ import annotations

import time

import ray

from ..functions.hashing import hash64


def parse_robots(text: str) -> dict:
    """Minimal robots.txt: User-agent:* section's Disallow prefixes and
    Crawl-delay (seconds)."""
    disallow: list[str] = []
    delay = 0.0
    active = False
    for line in (text or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            active = val == "*"
        elif active and key == "disallow" and val:
            disallow.append(val)
        elif active and key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return {"disallow": disallow, "crawl_delay": delay}


@ray.remote(num_cpus=0)
class PolitenessGate:
    """One gate actor owns the clocks + robots cache for its host slice."""

    def __init__(self, robots_by_host: dict[str, str] | None = None,
                 default_delay: float = 0.0):
        self.rules = {h: parse_robots(t) for h, t in (robots_by_host or {}).items()}
        self.default_delay = default_delay
        self.next_free: dict[str, float] = {}

    def acquire(self, host: str, n: int) -> float:
        """Reserve n fetches on host; returns seconds to wait before
        them. The reference time is THIS actor's monotonic clock (see
        module docstring — caller clocks are not comparable)."""
        now = time.monotonic()
        rule = self.rules.get(host)
        delay = rule["crawl_delay"] if rule else self.default_delay
        start = max(self.next_free.get(host, now), now)
        self.next_free[host] = start + n * delay
        return max(0.0, start - now)

    def allowed(self, host: str, paths: list[str]) -> list[bool]:
        rule = self.rules.get(host)
        if not rule:
            return [True] * len(paths)
        dis = rule["disallow"]
        return [not any(p.startswith(d) for d in dis) for p in paths]

    def snapshot(self) -> dict:
        return {"next_free": dict(self.next_free)}


def make_gates(n_gates: int, robots_by_host: dict[str, str],
               default_delay: float = 0.0) -> list:
    """Create the gate pool; host → gate routing is hash64(host) % n.
    Each gate receives ONLY its own host slice (same routing hash) —
    a host's rules are only ever consulted at its one gate, so
    shipping the full map would multiply robots parse work and memory
    by n_gates for nothing at millions of hosts."""
    slices: list[dict[str, str]] = [{} for _ in range(n_gates)]
    for h, t in (robots_by_host or {}).items():
        slices[hash64(h) % n_gates][h] = t
    return [PolitenessGate.remote(s, default_delay) for s in slices]


def gate_for(gates: list, host: str):
    return gates[hash64(host) % len(gates)]
