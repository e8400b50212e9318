"""Per-fetch-worker client caches: cookies (T3) and DNS (T4).

Reference semantics re-expressed:

- CookieJar — vendor/PHPCrawl_083/libs/CookieCache/
  PHPCrawlerMemoryCookieCache.class.php:17-82 +
  PHPCrawlerCookieDescriptor.class.php: cookies keyed per source DOMAIN,
  name-deduped; domain tail-matching ("acme.com" matches
  "anvil.acme.com", a leading dot is stripped), path prefix matching,
  expiry honored when an Expires/Max-Age attribute was set.
- DnsCache — vendor/PHPCrawl_083/libs/PHPCrawlerDNSCache.class.php:26-41:
  memoized host → address; the resolver itself is injected (a production
  fetcher passes a real resolver; the synthetic fetcher uses the identity
  function, keeping the memoization observable via ``hits``/``misses``).

Both live INSIDE a fetch worker actor (state/__init__-once semantics,
SURVEY §2.3) — they are per-connection-pool state, never shuffled.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from ..functions import urltools as ut

_ATTR_RE = re.compile(r"\s*([^=;]+)(?:=([^;]*))?")


@dataclass
class Cookie:
    name: str
    value: str
    domain: str
    path: str = "/"
    expire_ts: float | None = None
    source_url: str = ""


def parse_set_cookie(header: str, source_url: str) -> Cookie | None:
    """One ``Set-Cookie`` header value → :class:`Cookie` (None if malformed).
    Unspecified domain/path default to the source URL's host / directory."""
    parts = [p.strip() for p in header.split(";") if p.strip()]
    if not parts or "=" not in parts[0]:
        return None
    name, value = parts[0].split("=", 1)
    sp = ut.split_url(source_url)
    domain = str(sp["host"]) if sp else ""
    # Path-less cookies default to the source URL's directory, not "/"
    # (PHPCrawlerCookieDescriptor.class.php:117)
    path = str(sp["path"]) if sp else "/"
    expire_ts: float | None = None
    for attr in parts[1:]:
        if "=" in attr:
            k, v = attr.split("=", 1)
        else:
            k, v = attr, ""
        k, v = k.strip().lower(), v.strip()
        if k == "domain" and v:
            domain = v.lstrip(".")  # leading dot stripped (tail-match anyway)
        elif k == "path" and v:
            path = v
        elif k == "max-age":
            try:
                expire_ts = time.time() + float(v)
            except ValueError:
                pass
        elif k == "expires" and expire_ts is None:
            try:
                import email.utils

                dt = email.utils.parsedate_to_datetime(v)
                expire_ts = dt.timestamp()
            except (TypeError, ValueError):
                pass
    return Cookie(name.strip(), value, domain, path, expire_ts, source_url)


@dataclass
class CookieJar:
    """T3 — per-domain cookie store with the reference's matching rules."""

    _by_domain: dict[str, dict[str, Cookie]] = field(default_factory=dict)

    def add(self, cookie: Cookie) -> None:
        sp = ut.split_url(cookie.source_url)
        src_domain = str(sp["domain"]) if sp else cookie.domain
        # per source-domain bucket, name+domain+path dedup (newest wins)
        key = f"{cookie.name}|{cookie.domain}|{cookie.path}"
        self._by_domain.setdefault(src_domain, {})[key] = cookie

    def add_set_cookie(self, header: str, source_url: str) -> None:
        c = parse_set_cookie(header, source_url)
        if c is not None:
            self.add(c)

    def cookies_for(self, target_url: str, now: float | None = None) -> list[Cookie]:
        """Cookies applying to a URL: same source-domain bucket, domain
        tail-match, path prefix, not expired; name-deduped."""
        sp = ut.split_url(target_url)
        if not sp:
            return []
        host, domain, path = str(sp["host"]), str(sp["domain"]), str(sp["path"]) or "/"
        now = time.time() if now is None else now
        out: dict[str, Cookie] = {}
        for c in self._by_domain.get(domain, {}).values():
            if c.expire_ts is not None and c.expire_ts < now:
                continue
            if not (host == c.domain or host.endswith(c.domain)):
                continue
            if not path.startswith(c.path):
                continue
            out[c.name] = c
        return list(out.values())

    def header_for(self, target_url: str, now: float | None = None) -> str:
        """The ``Cookie:`` request-header value ('' when none apply)."""
        return "; ".join(
            f"{c.name}={c.value}" for c in self.cookies_for(target_url, now)
        )


class SendDataCache:
    """T9 — per-URL request overlays: basic-auth and POST data keyed by URL
    regex (vendor/PHPCrawl_083/libs/PHPCrawlerUserSendDataCache.class.php via
    PHPCrawler.class.php:721-733 — first matching auth applies, ALL matching
    post-data entries merge)."""

    def __init__(self, auth_rules=(), post_rules=()):
        self._auth = [(re.compile(rx), user, pw) for rx, user, pw in auth_rules]
        self._post = [(re.compile(rx), tuple(kv)) for rx, kv in post_rules]

    def auth_for(self, url: str) -> tuple[str, str] | None:
        for rx, user, pw in self._auth:
            if rx.search(url):
                return (user, pw)
        return None

    def post_for(self, url: str) -> dict[str, str]:
        out: dict[str, str] = {}
        for rx, kv in self._post:
            if rx.search(url):
                out.update(dict(kv))
        return out

    def request_overlay(self, url: str) -> dict:
        """What the HTTP request would carry: method, form body, auth
        header (the production fetch plumbs this into its client)."""
        import base64

        post = self.post_for(url)
        auth = self.auth_for(url)
        headers = {}
        if auth is not None:
            headers["Authorization"] = "Basic " + base64.b64encode(
                f"{auth[0]}:{auth[1]}".encode()
            ).decode()
        return {"method": "POST" if post else "GET", "post": post, "headers": headers}


class DnsCache:
    """T4 — memoized host resolution; inject the resolver."""

    def __init__(self, resolver=None):
        self._resolve = resolver or (lambda host: host)
        self._cache: dict[str, str] = {}
        self.hits = 0
        self.misses = 0

    def get(self, host: str) -> str:
        addr = self._cache.get(host)
        if addr is not None:
            self.hits += 1
            return addr
        self.misses += 1
        addr = self._resolve(host)
        self._cache[host] = addr
        return addr

    def __len__(self) -> int:
        return len(self._cache)
