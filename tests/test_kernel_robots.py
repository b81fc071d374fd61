"""robots.txt oracle tests — transcribed from RobotsDotTextTest.cs."""

import pytest

from abot_dotnet_core_spark.kernel.robots import (
    flat_to_rules, is_url_allowed, parse_robots, rules_to_flat,
)

ROOT = "http://www.spidertestsite1.com/"
UA = "Some User Agent..."

# RobotsDotTextTest.cs:16-37 — the canonical fixture
CONTENT = """
User-Agent: *
Disallow: /disallowedfile.txt
Disallow: /disallowedfolder
Disallow: /disallowedfolder/subfolder
Crawl-Delay: 20

User-Agent: badagent
Disallow: /

User-Agent: userAgentCrawlDelayIs1
Crawl-Delay: 1

User-Agent: userAgentCrawlDelayNotSpecified
Allow: /

User-Agent: userAgentCrawlDelayEmpty
Crawl-Delay:

Sitemap: http://a.com/sitemap.xml
Sitemap: http://b.com/sitemap.xml
"""


@pytest.fixture
def rules():
    return parse_robots(CONTENT)


class TestAllowed:
    # RobotsDotTextTest.cs:71-99
    @pytest.mark.parametrize("path", ["", "allowedfolder/aa.html",
                                      "allowedfolder/bb.html", "allowedfile2"])
    def test_allowed_pages_star(self, rules, path):
        assert is_url_allowed(rules, ROOT, ROOT + path, UA)

    # :79-93 — "*" not inherited by a specific group
    @pytest.mark.parametrize("path", ["", "disallowedfile.txt", "disallowedfolder",
                                      "disallowedfolder/", "disallowedfolder/subfolder",
                                      "disallowedfolder/subfolder/"])
    def test_no_star_inheritance(self, rules, path):
        assert is_url_allowed(rules, ROOT, ROOT + path, "userAgentCrawlDelayIs1")

    # :103-117
    @pytest.mark.parametrize("path", ["disallowedfile.txt", "disallowedfolder",
                                      "disallowedfolder/", "disallowedfolder/subfolder",
                                      "disallowedfolder/subfolder/"])
    def test_disallowed_star(self, rules, path):
        assert not is_url_allowed(rules, ROOT, ROOT + path, UA)

    @pytest.mark.parametrize("path", ["", "allowedfolder/aa.html",
                                      "allowedfolder/bb.html", "allowedfile2"])
    def test_badagent_disallow_all(self, rules, path):
        assert not is_url_allowed(rules, ROOT, ROOT + path, "badagent")

    # :121-134 empty content allows all
    @pytest.mark.parametrize("path", ["", "disallowedfile.txt", "allowedfolder/aa.html"])
    def test_empty_content(self, path):
        empty = parse_robots("")
        assert is_url_allowed(empty, ROOT, ROOT + path, UA)

    # :144-167 external always allowed
    @pytest.mark.parametrize("path", ["", "disallowedfolder", "disallowedfile.txt"])
    def test_external_bypass(self, rules, path):
        assert is_url_allowed(rules, ROOT, "http://yahoo.com/" + path, UA)

    # :188-203 wildcard group allow/disallow of "/"
    def test_wildcard_allow_root(self):
        r = parse_robots("User-Agent: *\nAllow: /")
        assert is_url_allowed(r, ROOT, ROOT, "*")

    def test_wildcard_disallow_root(self):
        r = parse_robots("User-Agent: *\nDisallow: /")
        assert not is_url_allowed(r, ROOT, ROOT, "aaaaaaaaaaaa")

    def test_badagent_user_agent_not_allowed(self, rules):
        assert not is_url_allowed(rules, ROOT, ROOT, "badagent")

    # :212-224 empty Disallow allows everything
    def test_empty_disallow(self):
        r = parse_robots("User-agent: *\nDisallow:")
        assert is_url_allowed(r, ROOT, ROOT, UA)
        assert is_url_allowed(r, ROOT, ROOT + "aa.html", UA)

    def test_whitespace_disallow(self):
        r = parse_robots("User-agent: *\nDisallow: ")
        assert is_url_allowed(r, ROOT, ROOT, UA)
        assert is_url_allowed(r, ROOT, ROOT + "aa.html", UA)

    # :226-263 querystring rules unsupported
    def test_querystring_on_root(self):
        r = parse_robots("User-Agent: *\nDisallow: /?category=whatever\n"
                         "Disallow: /?category=another&color=red")
        assert is_url_allowed(r, ROOT, ROOT, UA)
        assert is_url_allowed(r, ROOT, ROOT + "?category=whatever", UA)
        assert is_url_allowed(r, ROOT, ROOT + "?category=another&blah=blah", UA)

    # null/empty user agents fall to "*"
    def test_null_empty_ua(self, rules):
        assert is_url_allowed(rules, ROOT, ROOT, None)
        assert is_url_allowed(rules, ROOT, ROOT, "")
        assert not is_url_allowed(rules, ROOT, ROOT + "disallowedfolder", None)


class TestCrawlDelay:
    # RobotsDotTextTest.cs:274-286
    def test_value_exists(self, rules):
        assert rules.crawl_delay(UA) == 20
        assert rules.crawl_delay("userAgentCrawlDelayIs1") == 1

    def test_value_missing(self, rules):
        assert rules.crawl_delay("badagent") == 0
        assert rules.crawl_delay("userAgentCrawlDelayNotSpecified") == 0
        assert rules.crawl_delay("userAgentCrawlDelayEmpty") == 0


class TestFlatRoundTrip:
    def test_roundtrip(self, rules):
        rt = flat_to_rules(rules_to_flat(rules))
        assert rt.crawl_delay(UA) == 20
        assert not is_url_allowed(rt, ROOT, ROOT + "disallowedfolder", UA)
        assert is_url_allowed(rt, ROOT, ROOT + "disallowedfolder", "userAgentCrawlDelayIs1")
        assert not is_url_allowed(rt, ROOT, ROOT, "badagent")
