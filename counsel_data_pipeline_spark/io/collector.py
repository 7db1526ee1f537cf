"""Landing-zone collector (SURVEY §2.1 S1/S2) — the one reference stage
that previously stayed outside the engine.

Reference behavior reproduced:

- ``src/http_crawl.js:16-45`` (S2): GET the query form once to obtain the
  session cookie + anti-forgery token, then POST the datagrid JSON API
  per page with county/isYes/page/rows form fields (:47-78), echoing the
  token both as a header and a form field.
- ``src/index.js:285-316`` (S1 ``collectByCondition``): per (county,
  yes|no) loop pages until the UI page count is exhausted, accumulate
  rows, first-wins dedup by (countyName, org text, address text)
  (``uniqByKey``, src/index.js:89-98), then write
  ``<code>_<name>_{yes,no}_raw.json`` as ``{total, rows, totalPages}``
  (``processOneCounty``, src/index.js:318-340).

Engine integration: :func:`collect_landing` writes DATED landing files
(`<out>/<YYYY-MM-DD>/...`, the T5 snapshot-retention layout) and returns
the ordered ``county_files`` list that feeds
:func:`pipeline.crawl_clean_merge` directly — the full §3.1 DAG now runs
end-to-end from a transport, not from pre-staged fixtures.

Transports are pluggable behind one two-method protocol, same pattern as
ops/enrich's geocoder resolvers:

- :class:`HttpTransport` — real stdlib-urllib implementation with exact
  form-field parity to the reference (verified by mocked-transport
  tests; this container has no network).
- :class:`ReplayTransport` — deterministic replay of committed
  ``*_raw.json`` fixtures, re-paginated, so tests and CI runs exercise
  the identical pagination/uniq/write path without a browser or network.

Scale note: the collector is landing-zone code — a single-site, politely
paced scraper writing kilobyte JSON files. It is deliberately plain
driver-side Python (the 100 TB engine starts AT the landing files); the
pacing hook mirrors the reference's humanPause (F27) but is injectable
and defaults to no-op.
"""

from __future__ import annotations

import json
import math
import os
import re
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any, Protocol


class CollectorTransport(Protocol):
    def fetch_page(
        self, county_value: str, is_yes: bool, page: int, page_size: int
    ) -> dict[str, Any]:
        """One datagrid page: ``{"total": int, "rows": [raw_grid_row...]}``."""
        ...


# ---------------------------------------------------------------------------
# raw-row first-wins uniq (src/index.js:89-98) — plain-Python twin of the
# engine's ops/dedup.uniq_by_key, applied collector-side exactly like the
# reference so landing files match its committed artifacts byte-for-row.
# ---------------------------------------------------------------------------

_ANCHOR_RE = re.compile(r"<a[^>]*href=['\"]([^'\"]+)['\"][^>]*>(.*?)</a>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]*>")


def _unesc(s: Any) -> Any:
    if not isinstance(s, str):
        return s
    return (
        s.replace("\\u003c", "<")
        .replace("\\u003e", ">")
        .replace("\\u0026", "&")
        .replace("&amp;", "&")
    )


def _anchor_text(html: Any) -> str | None:
    if not html:
        return None
    s = _unesc(str(html))
    m = _ANCHOR_RE.search(s)
    if m:
        return _unesc(_TAG_RE.sub("", m.group(2)))
    return _unesc(_TAG_RE.sub("", s))


def uniq_raw_rows(rows: Sequence[dict[str, Any]]) -> list[dict[str, Any]]:
    """First-wins per (county, org text, address text) — uniqByKey."""
    seen: dict[str, dict[str, Any]] = {}
    for r in rows or []:
        k = "||".join(
            [
                str(r.get("countyName") or ""),
                str(_anchor_text(r.get("orgName")) or ""),
                str(_anchor_text(r.get("address")) or ""),
            ]
        ).strip()
        if k not in seen:
            seen[k] = r
    return list(seen.values())


# ---------------------------------------------------------------------------
# Transports
# ---------------------------------------------------------------------------

_FORM_PATH = "/Home/QueryServiceOrg"
_API_PATH = "/Home/QueryServiceOrgJsonList"
_TOKEN_INPUT_RE = re.compile(
    r'name="__RequestVerificationToken"\s+type="hidden"\s+value="([^"]+)"', re.I
)
_TOKEN_JS_RE = re.compile(
    r'RequestVerificationToken["\']?\s*[:=]\s*["\']([^"\']+)["\']', re.I
)


@dataclass
class HttpSession:
    cookie: str = ""
    token: str | None = None


def parse_session(set_cookie: str, html: str) -> HttpSession:
    """Cookie/token extraction with reference parity
    (src/http_crawl.js:27-42): split multi Set-Cookie on ``, `` before a
    ``k=`` pair, keep the first attr of each, join with '; '; token from
    the hidden form input, else the JS-assignment fallback."""
    cookie = "; ".join(
        s.split(";")[0]
        for s in re.split(r", (?=[^;]+?=)", set_cookie or "")
        if s.split(";")[0]
    )
    token = None
    m = _TOKEN_INPUT_RE.search(html or "")
    if m:
        token = m.group(1)
    if not token:
        m = _TOKEN_JS_RE.search(html or "")
        if m:
            token = m.group(1)
    return HttpSession(cookie=cookie, token=token)


@dataclass
class HttpTransport:
    """S2: direct JSON-API collector (src/http_crawl.js). The raw HTTP
    calls are injectable (this container has no network); the default
    uses stdlib urllib. ``get`` returns (set_cookie_header, body_text);
    ``post`` returns the parsed-JSON body text."""

    base_url: str
    get: Callable[[str, dict[str, str]], tuple[str, str]] | None = None
    post: Callable[[str, dict[str, str], dict[str, str]], str] | None = None
    user_agent: str = "Mozilla/5.0 (CI http crawler)"
    _session: HttpSession | None = None

    def _default_get(self, url: str, headers: dict[str, str]) -> tuple[str, str]:
        import urllib.request

        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.headers.get("Set-Cookie", "") or "", resp.read().decode(
                "utf-8", "replace"
            )

    def _default_post(
        self, url: str, data: dict[str, str], headers: dict[str, str]
    ) -> str:
        import urllib.parse
        import urllib.request

        req = urllib.request.Request(
            url, data=urllib.parse.urlencode(data).encode(), headers=headers
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.read().decode("utf-8", "replace")

    def ensure_session(self) -> HttpSession:
        if self._session is None:
            get = self.get or self._default_get
            set_cookie, html = get(
                self.base_url + _FORM_PATH,
                {
                    "User-Agent": self.user_agent,
                    "Accept": "text/html,application/xhtml+xml",
                },
            )
            self._session = parse_session(set_cookie, html)
        return self._session

    def fetch_page(
        self, county_value: str, is_yes: bool, page: int, page_size: int
    ) -> dict[str, Any]:
        sess = self.ensure_session()
        # field parity with src/http_crawl.js:49-58 — both county spellings,
        # lowercase booleans, stringified page numbers, empty sort/order
        body = {
            "county": str(county_value),
            "countyId": str(county_value),
            "isYes": "true" if is_yes else "false",
            "page": str(page),
            "rows": str(page_size),
            "sort": "",
            "order": "",
        }
        headers = {
            "Content-Type": "application/x-www-form-urlencoded; charset=UTF-8",
            "Accept": "application/json, text/javascript, */*; q=0.01",
            "Origin": self.base_url,
            "Referer": self.base_url + _FORM_PATH,
            "User-Agent": self.user_agent,
            "Cookie": sess.cookie,
        }
        if sess.token:
            headers["RequestVerificationToken"] = sess.token
            body["__RequestVerificationToken"] = sess.token
        post = self.post or self._default_post
        js = json.loads(post(self.base_url + _API_PATH, body, headers) or "{}")
        rows = js.get("rows") if isinstance(js, dict) else js
        rows = rows if isinstance(rows, list) else []
        total = js.get("total") if isinstance(js, dict) else None
        if not isinstance(total, (int, bool)) or isinstance(total, bool):
            try:  # stringified ({"total": "63"}) and float ({"total": 63.0})
                # totals coerce — the reference accepts any finite number
                # (Number.isFinite); inf/nan fall through to None
                total = int(float(str(total)))
            except (TypeError, ValueError, OverflowError):
                total = None
        if total is None:
            # no finite total in the body. A SHORT page is a complete
            # result (the reference's list.length fallback); a FULL page
            # may be a silently-truncated multi-page set — fail loud
            # rather than land a fraction of a county (the runaway-guard
            # posture, applied to under-collection).
            if len(rows) >= page_size:
                raise RuntimeError(
                    f"upstream response for county {county_value} page {page} "
                    f"carries no usable 'total' and a full page of "
                    f"{len(rows)} rows — cannot tell if more pages exist"
                )
            total = len(rows)
        return {"total": total, "rows": rows}


@dataclass
class ReplayTransport:
    """Deterministic upstream: replays fixture row lists, re-paginated —
    ``fixtures[county_value]`` is ``{"yes": [rows...], "no": [rows...]}``
    (e.g. loaded from the reference's committed ``*_raw.json``)."""

    fixtures: dict[str, dict[str, list[dict[str, Any]]]]
    calls: list[tuple[str, bool, int]] = field(default_factory=list)

    def fetch_page(
        self, county_value: str, is_yes: bool, page: int, page_size: int
    ) -> dict[str, Any]:
        self.calls.append((county_value, is_yes, page))
        rows = self.fixtures.get(county_value, {}).get("yes" if is_yes else "no", [])
        lo = (page - 1) * page_size
        return {"total": len(rows), "rows": rows[lo : lo + page_size]}


# ---------------------------------------------------------------------------
# S1: browser-datagrid transport — the reference's PRIMARY physical scan
# (src/index.js collectByCondition). Rows come from intercepted grid XHR
# responses, pagination from the UI pager text, and the grid dialog is
# closed + the form reopened between conditions so no page state leaks.
# ---------------------------------------------------------------------------


class BrowserPage(Protocol):
    """The minimal slice of a driven browser page the crawl needs.

    Production binds it to a real Playwright page (:func:`playwright_page`);
    tests bind :class:`RecordedBrowserPage` — this sandbox ships no
    browser, so the recorded session is the CI-testable twin.
    """

    def open_form(self) -> None:
        """ensureFormLoaded / reopenFormFromHome (ref src/index.js:174-196)."""
        ...

    def select_county(self, value: str) -> None: ...

    def check_condition(self, is_yes: bool) -> None: ...

    def trigger_search(self) -> dict[str, Any]:
        """Fire the datagrid search; return the intercepted grid XHR JSON
        (ref waitForAnyGrid src/index.js:167-172 + triggerSearch :198-207)."""
        ...

    def pager_text(self) -> str:
        """Visible pager text, e.g. '共 7 頁' or '共 63 記錄'."""
        ...

    def click_next(self) -> dict[str, Any]:
        """Click the next-page button; return the intercepted grid XHR JSON
        (ref clickNextAndGetRows src/index.js:238-249)."""
        ...

    def close_dialog(self) -> None:
        """Close the grid dialog (ref closeGridDialog src/index.js:251-274)."""
        ...


_PAGER_PAGES_RE = re.compile(r"共\s*(\d+)\s*頁")
_PAGER_RECORDS_RE = re.compile(r"共\s*(\d+)\s*記錄")


def read_pager(text: str, page_size: int = 10) -> tuple[int, int]:
    """readTotalPages parity (ref src/index.js:209-231): prefer the easyUI
    '共 N 頁' page count, else '共 N 記錄' → ceil(N / page_size), else 1.
    Returns (total_rows, total_pages); when only a page count is visible
    the row total is the ``pages * page_size`` upper bound (all the UI
    exposes), so ceil(total/page_size) still reproduces the UI page count.
    """
    m = _PAGER_PAGES_RE.search(text or "")
    if m:
        pages = max(1, int(m.group(1)))
        return pages * page_size, pages
    m = _PAGER_RECORDS_RE.search(text or "")
    if m:
        total = max(0, int(m.group(1)))
        return total, max(1, math.ceil(total / page_size))
    return page_size, 1


@dataclass
class PlaywrightTransport:
    """S1 browser transport: maps the stateful browser crawl onto the
    :class:`CollectorTransport` paging contract (ref src/index.js:285-316).

    page 1 = open form → select county → check condition → trigger search,
    rows read from the intercepted grid XHR; page N>1 = the (N-1)th
    next-button click — the browser can only move forward, so pages must be
    requested in order (collect_by_condition does). Before re-searching
    with a grid open, the dialog is closed and the form reopened from home,
    the reference's page-state reset (src/index.js:251-274, :319-323).
    The row total comes from the UI pager, NOT the XHR body — the
    reference's readTotalPages physical plan.
    """

    page: BrowserPage
    _open: tuple[str, bool] | None = None
    _next_page: int = 2
    _total: int = 0

    def fetch_page(
        self, county_value: str, is_yes: bool, page: int, page_size: int
    ) -> dict[str, Any]:
        if page == 1:
            if self._open is not None:
                self.page.close_dialog()
            self.page.open_form()
            self.page.select_county(county_value)
            self.page.check_condition(is_yes)
            js = self.page.trigger_search()
            self._open = (county_value, is_yes)
            self._next_page = 2
            self._total, _ = read_pager(self.page.pager_text(), page_size)
        else:
            if self._open != (county_value, is_yes) or page != self._next_page:
                raise RuntimeError(
                    f"browser pagination is sequential: asked for page {page} "
                    f"of {county_value}/{'yes' if is_yes else 'no'} but the "
                    f"open grid is {self._open} at page {self._next_page}"
                )
            js = self.page.click_next()
            self._next_page += 1
        rows = js.get("rows") if isinstance(js, dict) else js
        return {"total": self._total, "rows": rows if isinstance(rows, list) else []}


@dataclass
class RecordedBrowserPage:
    """Recorded browser session: replays grid XHR payloads and pager text
    for a scripted crawl — the fixture twin of a real Playwright page
    (same role ReplayTransport plays for the HTTP path). ``fixtures`` is
    the replay shape: ``{county_value: {"yes": [rows...], "no": [...]}}``;
    ``actions`` records every page interaction so tests can assert the
    reference's dialog-reset sequence."""

    fixtures: dict[str, dict[str, list[dict[str, Any]]]]
    page_size: int = 10
    pager_style: str = "pages"  # "pages" -> '共 N 頁'; "records" -> '共 N 記錄'
    actions: list[str] = field(default_factory=list)
    _county: str = ""
    _is_yes: bool = True
    _page: int = 1
    _grid_open: bool = False

    def _rows(self) -> list[dict[str, Any]]:
        return self.fixtures.get(self._county, {}).get(
            "yes" if self._is_yes else "no", []
        )

    def _slice(self) -> dict[str, Any]:
        lo = (self._page - 1) * self.page_size
        return {"rows": self._rows()[lo : lo + self.page_size]}

    def open_form(self) -> None:
        self.actions.append("open_form")
        self._grid_open = False

    def select_county(self, value: str) -> None:
        self.actions.append(f"select:{value}")
        self._county = value

    def check_condition(self, is_yes: bool) -> None:
        self.actions.append(f"check:{'yes' if is_yes else 'no'}")
        self._is_yes = is_yes

    def trigger_search(self) -> dict[str, Any]:
        if self._grid_open:
            raise RuntimeError("search with a grid dialog already open")
        self.actions.append("search")
        self._grid_open = True
        self._page = 1
        return self._slice()

    def pager_text(self) -> str:
        n = len(self._rows())
        if self.pager_style == "records":
            return f"顯示 1 到 {min(n, self.page_size)} 共 {n} 記錄"
        return f"共 {max(1, math.ceil(n / self.page_size))} 頁"

    def click_next(self) -> dict[str, Any]:
        if not self._grid_open:
            raise RuntimeError("next-click with no grid open")
        self.actions.append("next")
        self._page += 1
        return self._slice()

    def close_dialog(self) -> None:
        self.actions.append("close_dialog")
        self._grid_open = False


def playwright_page(base_url: str) -> BrowserPage:
    """Production :class:`BrowserPage`: a thin adapter over a real
    Playwright page using the reference's selectors. Requires the
    ``playwright`` package and an installed browser — neither ships in
    this sandbox, so tests drive this adapter through a fake
    ``playwright.sync_api`` module (tests/test_playwright_adapter.py)
    while ``RecordedBrowserPage`` carries the transport-protocol tests;
    the adapter mirrors
    ref src/index.js: #county select, #isYes/#isNo checks,
    CSSM_SearchDataGrid trigger (:198-207), grid-XHR interception
    (:167-172), pager scrape (:209-231), CSSM_CloseDialog reset (:251-274).
    """
    try:
        from playwright.sync_api import sync_playwright
    except ImportError as exc:  # the sandbox path
        raise NotImplementedError(
            "playwright is not installed; use RecordedBrowserPage (tests) "
            "or HttpTransport (the reference's own browserless alternative)"
        ) from exc

    _GRID = "/mhs/Home/QueryServiceOrgJsonList"

    class _Adapter:
        def __init__(self) -> None:
            self._pw = sync_playwright().start()
            self._browser = self._pw.chromium.launch()
            self.page = self._browser.new_page()

        def _grid_response(self, action: Callable[[], None]) -> dict[str, Any]:
            with self.page.expect_response(
                lambda r: _GRID in r.url and r.request.method == "POST",
                timeout=60_000,
            ) as info:
                action()
            try:
                return info.value.json()
            except Exception:  # noqa: BLE001 — non-JSON grid body = no rows
                return {"rows": []}

        def open_form(self) -> None:
            self.page.goto(base_url, wait_until="domcontentloaded")
            if not self.page.locator("#QueryOrgServiceCaseForm").count():
                self.page.locator("a.queryServiceOrg").first.click()
                self.page.wait_for_selector("#QueryOrgServiceCaseForm")

        def select_county(self, value: str) -> None:
            self.page.select_option("#county", value)

        def check_condition(self, is_yes: bool) -> None:
            self.page.check("#isYes" if is_yes else "#isNo")

        def trigger_search(self) -> dict[str, Any]:
            return self._grid_response(
                lambda: self.page.evaluate(
                    "CSSM_SearchDataGrid('QueryOrgServiceCaseDg')"
                )
            )

        def pager_text(self) -> str:
            loc = self.page.locator(".ui-paging-info, .pagination-info")
            return loc.first.text_content() or "" if loc.count() else ""

        def click_next(self) -> dict[str, Any]:
            btn = self.page.locator(
                "a.l-btn.l-btn-plain", has=self.page.locator(".pagination-next")
            ).first
            return self._grid_response(btn.click)

        def close_dialog(self) -> None:
            self.page.evaluate(
                "CSSM_CloseDialog(false, 'QueryServiceOrgDialog')"
            )

    return _Adapter()


# ---------------------------------------------------------------------------
# Collection loop + dated landing writes
# ---------------------------------------------------------------------------


@dataclass
class CountySpec:
    value: str  # upstream option value, e.g. "1"
    name: str   # display name, e.g. "臺北市"

    @property
    def code(self) -> str:
        return str(self.value).zfill(2)  # F23 pad2 (src/index.js:13)


def collect_by_condition(
    transport: CollectorTransport,
    county_value: str,
    is_yes: bool,
    *,
    page_size: int = 10,
    pause: Callable[[str], None] | None = None,
    max_pages: int = 1000,
) -> dict[str, Any]:
    """S1 collectByCondition: page until the reported total is covered,
    accumulate, first-wins uniq. ``max_pages`` is a runaway guard the
    browser reference gets for free from its UI page count."""
    wait = pause or (lambda kind: None)
    first = transport.fetch_page(county_value, is_yes, 1, page_size)
    total = int(first.get("total") or 0)
    rows = list(first.get("rows") or [])
    total_pages = max(1, math.ceil(total / page_size)) if total else 1
    if total_pages > max_pages:
        raise RuntimeError(
            f"county {county_value}: {total_pages} pages exceeds guard {max_pages}"
        )
    for page in range(2, total_pages + 1):
        wait("medium")
        got = transport.fetch_page(county_value, is_yes, page, page_size)
        rows.extend(got.get("rows") or [])
    uniq = uniq_raw_rows(rows)
    return {"total": len(uniq), "rows": uniq, "totalPages": total_pages}


def collect_landing(
    transport: CollectorTransport,
    counties: Sequence[CountySpec],
    out_dir: str,
    *,
    date: str,
    page_size: int = 10,
    pause: Callable[[str], None] | None = None,
) -> list[tuple[str, str, str]]:
    """processOneCounty over the county list: write dated landing files
    ``<out>/<date>/<code>_<name>_{yes,no}_raw.json`` in the reference's
    wrapper shape and return the ordered ``county_files`` list that
    :func:`pipeline.crawl_clean_merge` consumes. ``date`` is explicit —
    landing layout is the caller's clock, not the library's."""
    dated = os.path.join(out_dir, date)
    os.makedirs(dated, exist_ok=True)
    county_files: list[tuple[str, str, str]] = []
    for spec in counties:
        key = f"{spec.code}_{spec.name}"
        paths = {}
        for kind, is_yes in (("yes", True), ("no", False)):
            payload = collect_by_condition(
                transport, spec.value, is_yes, page_size=page_size, pause=pause
            )
            p = os.path.join(dated, f"{key}_{kind}_raw.json")
            with open(p, "w", encoding="utf-8") as f:
                json.dump(payload, f, ensure_ascii=False, indent=2)
            paths[kind] = p
        county_files.append((key, paths["yes"], paths["no"]))
    return county_files


def replay_from_reference_out(
    ref_out_dir: str, county_keys: Sequence[str]
) -> tuple[ReplayTransport, list[CountySpec]]:
    """Build a ReplayTransport from committed ``<key>_{yes,no}_raw.json``
    files (key = ``<code>_<name>``), preserving list order."""
    fixtures: dict[str, dict[str, list[dict[str, Any]]]] = {}
    specs: list[CountySpec] = []
    for key in county_keys:
        code, name = key.split("_", 1)
        value = str(int(code))
        per = {}
        for kind in ("yes", "no"):
            with open(
                os.path.join(ref_out_dir, f"{key}_{kind}_raw.json"),
                encoding="utf-8",
            ) as f:
                per[kind] = json.load(f).get("rows") or []
        fixtures[value] = per
        specs.append(CountySpec(value=value, name=name))
    return ReplayTransport(fixtures), specs


# ---------------------------------------------------------------------------
# F27 pacing + V4/V5 reachability probe & retry
# ---------------------------------------------------------------------------

PAUSE_TABLE_MS: dict[str, tuple[int, int]] = {
    # humanPause ranges, src/index.js:103-112
    "short": (120, 450),
    "medium": (300, 900),
    "long": (900, 1800),
    "county": (2000, 6000),
}


def human_pause(
    rand: Callable[[int, int], int],
    sleep: Callable[[float], None],
) -> Callable[[str], None]:
    """F27: the reference's jittered pacing as an injectable pause hook
    for :func:`collect_by_condition` / :func:`collect_landing` — rand and
    sleep are injected so tests assert the schedule without waiting.
    Unknown kinds fall back to 'short', like the JS table lookup."""

    def pause(kind: str = "short") -> None:
        a, b = PAUSE_TABLE_MS.get(kind, PAUSE_TABLE_MS["short"])
        sleep(rand(a, b) / 1000.0)

    return pause


def probe_reachability(
    get: Callable[[str, dict[str, str]], tuple[str, str]],
    url: str,
) -> bool:
    """V4 (test.yml 'Probe target reachability'): one GET against the
    form URL; True iff it answers at all. Diagnostic, not a gate — the
    reference logs the HTTP code and proceeds either way."""
    try:
        get(url, {"User-Agent": "reachability-probe"})
        return True
    except Exception:  # noqa: BLE001 — any transport failure = unreachable
        return False


def with_attempts(
    fn: Callable[[], Any],
    max_attempts: int = 3,
    backoff_s: float = 30.0,
    sleep: Callable[[float], None] = None,  # type: ignore[assignment]
) -> Any:
    """V5 (test.yml attempt/until loop): run ``fn`` up to ``max_attempts``
    times with a fixed pause between attempts; re-raise the last failure.
    Wrap a whole :func:`collect_landing` run with it, the way the CI
    wraps the whole container run — NOT individual page fetches (a
    mid-crawl retry would re-fetch pages already landed)."""
    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    import time as _time

    do_sleep = sleep or _time.sleep
    last: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — the CI loop retries any failure
            last = exc
            if attempt < max_attempts:
                do_sleep(backoff_s)
    raise last  # type: ignore[misc]
