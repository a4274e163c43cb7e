"""robots.txt synthesis + parsing (crawl politeness, RFC 9309-lite).

A crawl engine must honor per-host exclusion rules before scheduling
frontier URLs. This module provides:

- ``synth_robots_txt(host)`` — the deterministic robots.txt each synthetic
  host serves (no external data: a pure function of the host name, so
  DuckDB oracles re-derive its effect arithmetically);
- ``RobotsRules`` / ``parse_robots_txt`` — a group-aware parser with
  longest-match Allow/Disallow precedence (the RFC 9309 evaluation rule;
  ``*`` wildcards and ``$`` anchors are out of scope and documented so);
- ``allowed_mask(rules_by_host, hosts, paths)`` — the vectorized batch
  check used inside ``map_batches`` (rules are dict lookups + str prefix
  scans per row over ≤ a handful of rules; rule tables are
  host-vocabulary-sized and broadcast once via ``ray.put``).

Reference scope: kgw fetches remote corpora politely (retry/backoff in
``kgw/_shared/load.py``); a crawl-scale engine extends that to exclusion
rules. The synthetic rule below disallows the id band ``[1000·(N%5),
1000·(N%5)+999]`` on host ``srcN`` via the 8-digit-zero-padded path
prefix ``/doc/0000K`` — real prefix semantics that stay arithmetic for
the oracle (``doc_id // 1000 == N % 5``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def synth_robots_txt(host: str) -> str:
    """Deterministic robots.txt for ``srcN.example.org``: one UA group
    disallowing the 8-digit id prefix band ``/doc/0000K`` with
    ``K = N % 5``, plus an Allow exception making the parser's
    longest-match precedence observable (``/doc/0000K9`` re-allows the
    ids ending that band's hundreds digit)."""
    n = int(host.split(".", 1)[0].removeprefix("src"))
    k = n % 5
    return (
        "# synthetic exclusion rules\n"
        "User-agent: *\n"
        f"Disallow: /doc/0000{k}\n"
        f"Allow: /doc/0000{k}9\n"
        "\n"
        "User-agent: special-bot\n"
        "Disallow: /\n"
    )


@dataclass
class RobotsRules:
    """Allow/Disallow prefix rules for one user-agent group."""

    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)

    def is_allowed(self, path: str) -> bool:
        """RFC 9309 evaluation: the longest matching rule wins; ties
        prefer Allow; no match ⇒ allowed."""
        best_len, best_allow = -1, True
        for p in self.disallow:
            if p and path.startswith(p) and len(p) > best_len:
                best_len, best_allow = len(p), False
        for p in self.allow:
            if p and path.startswith(p) and len(p) >= best_len:
                # >= : equal-length tie prefers Allow
                if len(p) > best_len or not best_allow:
                    best_len, best_allow = len(p), True
        return best_allow


def parse_robots_txt(text: str, *, user_agent: str = "*") -> RobotsRules:
    """Parse the rule group for ``user_agent`` (exact token match, else
    the ``*`` group). Comments (#) and blank lines per the RFC; unknown
    directives ignored; group ends at the next User-agent run."""
    groups: dict[str, RobotsRules] = {}
    current: list[str] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                current = []
                in_group_body = False
            current.append(val.lower())
            for ua in current:
                groups.setdefault(ua, RobotsRules())
        elif key in ("disallow", "allow") and current:
            in_group_body = True
            for ua in current:
                g = groups[ua]
                (g.disallow if key == "disallow" else g.allow).append(val)
    return groups.get(user_agent.lower(), groups.get("*", RobotsRules()))


def rules_for_hosts(hosts) -> dict[str, RobotsRules]:
    """host → parsed default-UA rules, from each host's synthetic
    robots.txt (per-host parse happens ONCE; callers broadcast the dict).
    Hosts outside the synthetic ``srcN.*`` namespace get no entry — the
    real-crawl analog of a host serving no robots.txt (allowed_mask
    treats missing hosts as allowed)."""
    out: dict[str, RobotsRules] = {}
    for h in hosts:
        try:
            out[h] = parse_robots_txt(synth_robots_txt(h))
        except ValueError:
            continue
    return out


def allowed_mask(rules_by_host: dict[str, RobotsRules], hosts, paths):
    """Vectorized-enough batch check: one dict lookup + prefix scan per
    row (rule lists are O(1)-sized per host). Unknown hosts ⇒ allowed."""
    out = []
    empty = RobotsRules()
    for h, p in zip(hosts, paths):
        out.append(rules_by_host.get(h, empty).is_allowed(p))
    return out
