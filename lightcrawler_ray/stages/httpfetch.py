"""Production HTTP fetch primitive (S3) — the real-wire ``_fetch_raw``.

Re-expresses the reference's raw-socket client semantics
(PHPCrawlerHTTPRequest.class.php: sendRequest :363-510, openSocket :549-616,
body read :787-967) on the stdlib ``http.client`` transport:

- per-(scheme, host, port) connection reuse — the socket the reference
  keeps open across header+body phases; dropped on error or truncation
- DNS through the worker's :class:`~..state.clientcache.DnsCache` (T4),
  with the Host header carrying the name (openSocket resolves first,
  PHPCrawlerHTTPRequest.class.php:560-572)
- connect timeout / stream (read) timeout (CrawlerSettings.class.php:39-40)
- ``Accept-Encoding: gzip`` request + response gzip decode (M30,
  PHPCrawlerEncodingUtils.class.php:13-33)
- Cookie header from the CookieJar (T3), Set-Cookie responses stored back
  (PHPCrawler.class.php:717-719,830)
- basic-auth + POST form overlay from the SendDataCache (T9,
  PHPCrawler.class.php:722-733; buildRequestHeader :681-748)
- optional proxy with basic auth (setProxy
  PHPCrawlerHTTPRequest.class.php:314-330): plain-http requests go to the
  proxy socket (openSocket :569-572) with the absolute URI on the request
  line (buildRequestHeader :987-991 — "a proxy needs the full qualified
  URL") and a ``Proxy-Authorization: Basic`` header when credentials are
  set (:1028-1033); https adds the CONNECT tunnel the PHP client lacks
  (its proxy path predates TLS proxying — a gap, not a behavior to copy)
- size-capped streaming read: at most ``content_size_limit`` + 1 bytes
  leave the wire, so the caller's truncation mark (O3,
  PHPCrawlerHTTPRequest.class.php:956-962) fires without unbounded memory
- stream-to-file receive (addStreamToFileContentType,
  PHPCrawlerHTTPRequest.class.php:459-488): response content-types matching
  ``stream_to_file_rules`` are streamed chunk-by-chunk to a spill file —
  UNCAPPED and never held in memory — and the fetch result carries the
  file's (path, size, md5) instead of the body, the reference's
  ``received_to_file``/``content_tmp_file`` page-info fields
- redirects are NOT followed here — the Location header goes back to the
  engine, which emits the redirect link row (M6), exactly like the
  reference returns the header to the crawler loop

The class is per-fetch-worker state (connection pool + caches), never
shipped — the actor-pool exception documented in stages/fetchpool.py.
"""

from __future__ import annotations

import gzip
import socket
import zlib
from urllib.parse import urlencode

from ..functions import urltools as ut
from ..state.clientcache import CookieJar, DnsCache, SendDataCache


class TransportError(Exception):
    """Connect/read failure after the transport gave up (maps to a
    retryable status in the fetch loop, like the reference's
    error_occured + retry, PHPCrawler.class.php:735-751)."""


class HttpClient:
    def __init__(
        self,
        cookies: CookieJar | None = None,
        dns: DnsCache | None = None,
        send_data: SendDataCache | None = None,
        user_agent: str = "lightcrawler-ray/0.1",
        connect_timeout_s: float = 60.0,
        stream_timeout_s: float = 60.0,
        accept_gzip: bool = True,
        content_size_limit: int = 1 << 22,
        proxy: tuple = (),
        stream_to_file_rules: tuple = (),
        spill_dir: str = "",
    ):
        """``proxy`` is ``()`` (direct), ``(host, port)`` or
        ``(host, port, username, password)``.  ``stream_to_file_rules`` are
        content-type prefixes whose bodies spill to files under
        ``spill_dir`` (worker tmpdir when empty) instead of memory."""
        self.cookies = cookies if cookies is not None else CookieJar()
        self.dns = dns if dns is not None else DnsCache(resolver=socket.gethostbyname)
        self.send_data = send_data if send_data is not None else SendDataCache()
        self.ua = user_agent
        self.connect_timeout_s = connect_timeout_s
        self.stream_timeout_s = stream_timeout_s
        self.accept_gzip = accept_gzip
        self.content_size_limit = content_size_limit
        self.proxy = tuple(proxy)
        self._proxy_auth = ""
        if len(self.proxy) >= 3 and self.proxy[2]:
            import base64

            user, pw = self.proxy[2], self.proxy[3] if len(self.proxy) > 3 else ""
            self._proxy_auth = "Basic " + base64.b64encode(
                f"{user}:{pw}".encode()
            ).decode()
        self.stream_to_file_rules = tuple(stream_to_file_rules)
        self.spill_dir = spill_dir
        self._pool: dict[tuple, object] = {}
        self.requests_sent = 0
        self.connections_opened = 0

    # -- connection management ---------------------------------------------
    def _conn_for(self, scheme: str, host: str, port: int):
        import http.client

        key = (scheme, host, port)
        conn = self._pool.get(key)
        if conn is not None:
            return conn
        if self.proxy:
            # the socket goes to the proxy (openSocket :569-572); the proxy
            # resolves the target, we resolve only the proxy name (T4)
            paddr = self.dns.get(str(self.proxy[0]))
            pport = int(self.proxy[1])
            if scheme == "https":
                import ssl

                conn = http.client.HTTPSConnection(
                    paddr, pport, timeout=self.connect_timeout_s,
                    context=ssl.create_default_context(),
                )
                hdrs = {"Proxy-Authorization": self._proxy_auth} if self._proxy_auth else None
                conn.set_tunnel(host, port, headers=hdrs)  # CONNECT
            else:
                conn = http.client.HTTPConnection(
                    paddr, pport, timeout=self.connect_timeout_s
                )
        elif scheme == "https":
            import ssl

            addr = self.dns.get(host)  # T4: memoized name → address
            conn = http.client.HTTPSConnection(
                addr, port, timeout=self.connect_timeout_s,
                context=ssl.create_default_context(),
            )
        else:
            addr = self.dns.get(host)
            conn = http.client.HTTPConnection(addr, port, timeout=self.connect_timeout_s)
        self._pool[key] = conn
        self.connections_opened += 1
        return conn

    def _drop(self, scheme: str, host: str, port: int) -> None:
        conn = self._pool.pop((scheme, host, port), None)
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass

    # -- stream-to-file receive (O3 spill path) ------------------------------
    def _receive_to_file(self, resp) -> dict:
        """Stream the response body to a spill file in bounded 64 KiB chunks
        (gzip-decoding on the fly) — the reference's receiveToTmpFile
        (PHPCrawlerHTTPRequest.class.php:459-488).  The file is content-
        addressed (md5) so duplicate payloads collapse on disk; returns
        ``{"path", "size", "md5"}``."""
        import hashlib
        import os
        import tempfile
        import zlib

        d = self.spill_dir or tempfile.gettempdir()
        os.makedirs(d, exist_ok=True)
        gz = (resp.getheader("Content-Encoding") or "").lower() == "gzip"
        dec = zlib.decompressobj(16 + zlib.MAX_WBITS) if gz else None
        h = hashlib.md5()
        size = 0
        fd, tmp = tempfile.mkstemp(prefix="recv-", dir=d)
        try:
            with os.fdopen(fd, "wb") as f:
                while True:
                    chunk = resp.read(1 << 16)
                    if not chunk:
                        break
                    if dec is not None:
                        chunk = dec.decompress(chunk)
                    if chunk:
                        f.write(chunk)
                        h.update(chunk)
                        size += len(chunk)
                if dec is not None:
                    tail = dec.flush()
                    if tail:
                        f.write(tail)
                        h.update(tail)
                        size += len(tail)
        except BaseException:
            os.unlink(tmp)
            raise
        md5 = h.hexdigest()
        final = os.path.join(d, f"spill-{md5}.bin")
        os.replace(tmp, final)
        return {"path": final, "size": size, "md5": md5}

    # -- the request -------------------------------------------------------
    def fetch(self, url: str) -> tuple[int, str, bytes, str, dict | None]:
        """(status, content_type, body, location, spill).  ``spill`` is None
        for in-memory receives, else the :meth:`_receive_to_file` dict (and
        ``body`` is empty).  Raises :class:`TransportError` on connect/read
        failure (the caller's retry loop re-enters with a fresh
        connection)."""
        sp = ut.split_url(url)
        if not sp:
            raise TransportError(f"unparseable url: {url}")
        scheme, host, port = str(sp["protocol"]), str(sp["host"]), int(sp["port"])
        path = str(sp["path"]) + str(sp["file"])
        if sp["query"]:
            path += "?" + str(sp["query"])
        overlay = self.send_data.request_overlay(url)
        body_out = urlencode(overlay["post"]).encode() if overlay["post"] else None
        # plain-http via proxy: absolute URI on the request line
        # (buildRequestHeader :987-991); https rides the CONNECT tunnel set
        # up in _conn_for, so its request line stays origin-form
        proxied_plain = bool(self.proxy) and scheme != "https"
        request_target = url if proxied_plain else (path or "/")
        try:
            conn = self._conn_for(scheme, host, port)
            conn.putrequest(overlay["method"], request_target,
                            skip_host=True, skip_accept_encoding=True)
            hosthdr = host if port in (80, 443) else f"{host}:{port}"
            conn.putheader("Host", hosthdr)
            conn.putheader("User-Agent", self.ua)
            conn.putheader("Accept-Encoding", "gzip" if self.accept_gzip else "identity")
            cookie_hdr = self.cookies.header_for(url)  # T3
            if cookie_hdr:
                conn.putheader("Cookie", cookie_hdr)
            if proxied_plain and self._proxy_auth:  # :1028-1033
                conn.putheader("Proxy-Authorization", self._proxy_auth)
            for k, v in overlay["headers"].items():  # T9 (Authorization)
                conn.putheader(k, v)
            if body_out is not None:
                conn.putheader("Content-Type", "application/x-www-form-urlencoded")
                conn.putheader("Content-Length", str(len(body_out)))
            conn.endheaders(body_out)
            if conn.sock is not None:
                conn.sock.settimeout(self.stream_timeout_s)
            resp = conn.getresponse()
            self.requests_sent += 1
            ctype = (resp.getheader("Content-Type") or "").split(";")[0].strip()
            spill = None
            body = b""
            truncated_read = False
            if self.stream_to_file_rules and resp.status == 200 and any(
                ctype.startswith(r) for r in self.stream_to_file_rules
            ):
                try:
                    spill = self._receive_to_file(resp)
                except zlib.error as e:
                    raise TransportError(f"gzip stream: {e}") from e
            else:
                # capped streaming read: limit + 1 so the caller's truncation
                # check (len > limit) can fire
                cap = self.content_size_limit + 1
                chunks, got = [], 0
                while got < cap:
                    chunk = resp.read(min(1 << 16, cap - got))
                    if not chunk:
                        break
                    chunks.append(chunk)
                    got += len(chunk)
                body = b"".join(chunks)
                truncated_read = got >= cap and resp.read(1) != b""
        except (OSError, socket.timeout, ConnectionError) as e:
            self._drop(scheme, host, port)
            raise TransportError(str(e) or type(e).__name__) from e
        except Exception as e:  # http.client protocol errors
            self._drop(scheme, host, port)
            raise TransportError(f"{type(e).__name__}: {e}") from e
        for sc in resp.msg.get_all("Set-Cookie") or []:  # T3 store-back
            self.cookies.add_set_cookie(sc, url)
        if truncated_read or resp.will_close:
            self._drop(scheme, host, port)  # can't reuse a half-read socket
        if (resp.getheader("Content-Encoding") or "").lower() == "gzip" and body[:2] == b"\x1f\x8b":
            try:
                body = gzip.decompress(body)  # M30
            except OSError:
                pass  # partial gzip stream (capped read) — leave raw
        location = resp.getheader("Location") or resp.getheader("Content-Location") or ""
        return resp.status, ctype, body, location, spill

    def close(self) -> None:
        for key in list(self._pool):
            self._drop(*key)
