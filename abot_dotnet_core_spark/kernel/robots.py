"""robots.txt parsing + matching, pinned to the reference's tested semantics.

The reference delegates to the external ``Robots`` NuGet package
(/root/reference/Abot/src/Abot/Core/RobotsDotText.cs:68-72); its observable
behavior is fixed by RobotsDotTextTest.cs:

- per-UA group match, NO inheritance from ``*`` (RobotsDotTextTest.cs:79-93:
  an agent with its own group ignores the ``*`` disallows entirely)
- group selection: a group's UA token (lowercased) that is a substring of the
  caller's UA string wins over ``*``; longest token wins among specifics
- ``Disallow`` is a path-prefix match on the URL *path* (query excluded) —
  querystring rules are effectively unsupported (RobotsDotTextTest.cs:226-263)
- empty / whitespace ``Disallow:`` allows everything (:219-271)
- ``Crawl-delay`` per group, missing/empty -> 0 (:274-286)
- URLs outside the root are always allowed (RobotsDotText.cs:55-56)

The parsed form is a flat, columnar-friendly rule list so it can be carried
through a Spark broadcast join as plain arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .urlnorm import is_base_of, path_of


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)     # lowercased UA tokens
    disallow: list[str] = field(default_factory=list)   # path prefixes (non-empty)
    allow: list[str] = field(default_factory=list)
    crawl_delay: int = 0


@dataclass
class RobotsRules:
    groups: list[RobotsGroup] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)

    def _group_for(self, user_agent: str | None) -> RobotsGroup | None:
        ua = (user_agent or "").lower()
        best: RobotsGroup | None = None
        best_len = -1
        star: RobotsGroup | None = None
        for g in self.groups:
            for tok in g.agents:
                if tok == "*":
                    if star is None:
                        star = g
                elif tok and tok in ua and len(tok) > best_len:
                    best, best_len = g, len(tok)
        return best if best is not None else star

    def crawl_delay(self, user_agent: str | None) -> int:
        g = self._group_for(user_agent)
        return g.crawl_delay if g else 0

    def allowed_path(self, path: str, user_agent: str | None) -> bool:
        g = self._group_for(user_agent)
        if g is None:
            return True
        # Path-prefix model: a disallow rule matches iff the URL path starts
        # with the rule text verbatim. Rules containing '?' can then never
        # match a bare path — exactly the reference's "querystring not
        # supported" behavior. An Allow rule at least as specific overrides.
        matched_dis = max((len(r) for r in g.disallow if path.startswith(r)), default=-1)
        if matched_dis < 0:
            return True
        matched_alw = max((len(r) for r in g.allow if path.startswith(r)), default=-1)
        return matched_alw >= matched_dis


def parse_robots(content: str | None) -> RobotsRules:
    rules = RobotsRules()
    if not content:
        return rules
    current: RobotsGroup | None = None
    last_was_agent = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if current is None or not last_was_agent:
                current = RobotsGroup()
                rules.groups.append(current)
            current.agents.append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            rules.sitemaps.append(value)
            continue
        if current is None:
            continue
        if key == "disallow":
            if value:
                current.disallow.append(value)
        elif key == "allow":
            if value:
                current.allow.append(value)
        elif key == "crawl-delay":
            try:
                current.crawl_delay = int(float(value))
            except ValueError:
                current.crawl_delay = 0
            except OverflowError:      # hostile input: 'Crawl-delay: inf'
                current.crawl_delay = 0
    return rules


def is_url_allowed(rules: RobotsRules, root_url: str, url: str,
                   user_agent: str | None) -> bool:
    """RobotsDotText.IsUrlAllowed — external URLs bypass (RobotsDotText.cs:53-59)."""
    if not is_base_of(root_url, url):
        return True
    return rules.allowed_path(path_of(url), user_agent)


# --- flat (arrow-friendly) encoding for the Spark broadcast path -----------

def rules_to_flat(rules: RobotsRules) -> list[str]:
    """Encode as a list of strings: 'agents\\x1fdis1\\x1edis2\\x1falw..\\x1fdelay'
    one entry per group — survives an ArrayType(StringType) column."""
    out = []
    for g in rules.groups:
        out.append("\x1f".join([
            "\x1e".join(g.agents),
            "\x1e".join(g.disallow),
            "\x1e".join(g.allow),
            str(g.crawl_delay),
        ]))
    return out


def flat_to_rules(flat: list[str] | None) -> RobotsRules:
    rules = RobotsRules()
    for entry in flat or []:
        agents, dis, alw, delay = entry.split("\x1f")
        rules.groups.append(RobotsGroup(
            agents=[a for a in agents.split("\x1e") if a] or [""],
            disallow=[d for d in dis.split("\x1e") if d],
            allow=[a for a in alw.split("\x1e") if a],
            crawl_delay=int(delay),
        ))
    return rules
