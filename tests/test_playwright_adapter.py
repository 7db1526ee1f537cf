"""Drive ``playwright_page``'s real adapter control flow with a fake
``playwright.sync_api`` module (no browser in the sandbox).

``RecordedBrowserPage`` covers the *transport* protocol; these tests cover
the *adapter* itself — selector choices, grid-XHR interception predicate,
pager scrape, dialog reset — by installing a stand-in playwright module
whose page object is a state machine of the reference site
(ref src/index.js:167-274)."""

from __future__ import annotations

import math
import sys
import types
from types import SimpleNamespace

import pytest

from counsel_data_pipeline_spark.io import collector as C

GRID_URL = "https://svc.example.test/mhs/Home/QueryServiceOrgJsonList"


class FakeResponse:
    def __init__(self, url: str, method: str, body, json_ok: bool = True):
        self.url = url
        self.request = SimpleNamespace(method=method)
        self._body = body
        self._json_ok = json_ok

    def json(self):
        if not self._json_ok:
            raise ValueError("grid body is not JSON")
        return self._body


class _ExpectResponse:
    """Context-manager twin of playwright's expect_response: the action run
    inside the block must produce a response MATCHING the adapter's
    predicate, or ``.value`` raises — so the URL/method filter the adapter
    installs is genuinely exercised."""

    def __init__(self, page: "FakePage", predicate):
        self._page = page
        self._predicate = predicate

    def __enter__(self):
        self._page._captured = None
        return self

    def __exit__(self, *exc):
        return False

    @property
    def value(self) -> FakeResponse:
        resp = self._page._captured
        if resp is None or not self._predicate(resp):
            raise TimeoutError("no response matched the adapter's predicate")
        return resp


class FakeLocator:
    def __init__(self, page: "FakePage", selector: str, has=None):
        self._page = page
        self.selector = selector
        self.has = has

    @property
    def first(self) -> "FakeLocator":
        return self

    def count(self) -> int:
        if self.selector == "#QueryOrgServiceCaseForm":
            return 1 if self._page.form_present else 0
        if self.selector == ".ui-paging-info, .pagination-info":
            return 1 if self._page.grid_open else 0
        return 1

    def click(self) -> None:
        self._page.calls.append(f"click:{self.selector}")
        if self.selector == "a.queryServiceOrg":
            self._page.form_present = True
        elif self.selector == "a.l-btn.l-btn-plain":
            # the next-pager button only exists inside an open grid, and
            # the adapter must scope it with the .pagination-next `has=`
            assert self._page.grid_open, "next-click with no grid open"
            assert self.has is not None and self.has.selector == ".pagination-next"
            self._page.pageno += 1
            self._page.emit_grid()
        else:  # unexpected selector = adapter drift
            raise AssertionError(f"unexpected click target {self.selector}")

    def text_content(self) -> str:
        n = len(self._page.rows())
        return f"顯示資料 共 {max(1, math.ceil(n / self._page.page_size))} 頁"


class FakePage:
    """State machine of the reference site surfaced through the playwright
    page API the adapter uses."""

    def __init__(self, fixtures, page_size: int = 10, grid_json_ok: bool = True,
                 form_on_goto: bool = False):
        self.fixtures = fixtures
        self.page_size = page_size
        self.grid_json_ok = grid_json_ok
        self.form_on_goto = form_on_goto
        self.calls: list[str] = []
        self.form_present = False
        self.county: str | None = None
        self.is_yes = True
        self.grid_open = False
        self.pageno = 1
        self._captured: FakeResponse | None = None

    def rows(self):
        return self.fixtures.get(self.county, {}).get(
            "yes" if self.is_yes else "no", []
        )

    def emit_grid(self) -> None:
        lo = (self.pageno - 1) * self.page_size
        self._captured = FakeResponse(
            GRID_URL, "POST",
            {"rows": self.rows()[lo : lo + self.page_size]},
            json_ok=self.grid_json_ok,
        )

    # --- page API used by the adapter ---
    def goto(self, url: str, wait_until: str | None = None) -> None:
        self.calls.append("goto")
        self.form_present = self.form_on_goto

    def locator(self, selector: str, has=None) -> FakeLocator:
        return FakeLocator(self, selector, has)

    def wait_for_selector(self, selector: str) -> None:
        self.calls.append(f"wait:{selector}")
        assert self.form_present, "waited for a form that never appeared"

    def select_option(self, selector: str, value: str) -> None:
        assert selector == "#county"
        self.calls.append(f"select:{value}")
        self.county = value

    def check(self, selector: str) -> None:
        assert selector in ("#isYes", "#isNo")
        self.calls.append(f"check:{selector}")
        self.is_yes = selector == "#isYes"

    def evaluate(self, js: str):
        self.calls.append(f"evaluate:{js.split('(')[0]}")
        if "CSSM_SearchDataGrid" in js:
            self.grid_open = True
            self.pageno = 1
            self.emit_grid()
        elif "CSSM_CloseDialog" in js:
            self.grid_open = False
        else:
            raise AssertionError(f"unexpected evaluate: {js}")

    def expect_response(self, predicate, timeout: int | None = None):
        return _ExpectResponse(self, predicate)


@pytest.fixture
def fake_playwright(monkeypatch):
    """Install a fake ``playwright.sync_api`` whose chromium launch hands
    out one FakePage; returns a setter so each test supplies its page."""
    holder: dict[str, FakePage] = {}

    class _PW:
        def start(self):
            return self

        @property
        def chromium(self):
            return self

        def launch(self):
            return self

        def new_page(self):
            return holder["page"]

    root = types.ModuleType("playwright")
    api = types.ModuleType("playwright.sync_api")
    api.sync_playwright = lambda: _PW()
    root.sync_api = api
    monkeypatch.setitem(sys.modules, "playwright", root)
    monkeypatch.setitem(sys.modules, "playwright.sync_api", api)

    def use(page: FakePage) -> FakePage:
        holder["page"] = page
        return page

    return use


def _fixture_rows(n: int, tag: str):
    return [
        {"countyName": "臺北市", "orgName": f"<a href='#'>{tag}機構{i}</a>",
         "address": f"<a href='#'>南京東路{i}號</a>", "phone": f"02-{i:04d}"}
        for i in range(n)
    ]


def test_adapter_full_crawl_and_dialog_reset(fake_playwright):
    yes_rows = _fixture_rows(23, "y")
    no_rows = _fixture_rows(4, "n")
    page = fake_playwright(FakePage({"1": {"yes": yes_rows, "no": no_rows}}))

    adapter = C.playwright_page("https://svc.example.test/mhs/Home/QueryServiceOrg")
    transport = C.PlaywrightTransport(page=adapter)

    got_yes = C.collect_by_condition(transport, "1", True)
    assert got_yes["totalPages"] == 3  # 23 rows / page_size 10 via UI pager
    assert [r["phone"] for r in got_yes["rows"]] == [r["phone"] for r in yes_rows]

    # re-search (the no pass): adapter must close the dialog, re-open the
    # form from home, and re-trigger — the reference's page-state reset
    mark = len(page.calls)
    got_no = C.collect_by_condition(transport, "1", False)
    assert [r["phone"] for r in got_no["rows"]] == [r["phone"] for r in no_rows]
    reset_seq = [c for c in page.calls[mark:] if not c.startswith("wait")]
    assert reset_seq == [
        "evaluate:CSSM_CloseDialog",
        "goto",
        "click:a.queryServiceOrg",
        "select:1",
        "check:#isNo",
        "evaluate:CSSM_SearchDataGrid",
    ]


def test_adapter_form_already_present_skips_link_click(fake_playwright):
    rows = _fixture_rows(3, "y")
    page = fake_playwright(
        FakePage({"2": {"yes": rows}}, form_on_goto=True)
    )
    adapter = C.playwright_page("https://svc.example.test/mhs/Home/QueryServiceOrg")
    got = C.PlaywrightTransport(page=adapter).fetch_page("2", True, 1, 10)
    assert len(got["rows"]) == 3
    assert not any(c.startswith("click:a.queryServiceOrg") for c in page.calls)


def test_adapter_nonjson_grid_body_yields_no_rows(fake_playwright):
    page = fake_playwright(
        FakePage({"1": {"yes": _fixture_rows(5, "y")}}, grid_json_ok=False)
    )
    adapter = C.playwright_page("https://svc.example.test/mhs/Home/QueryServiceOrg")
    got = C.PlaywrightTransport(page=adapter).fetch_page("1", True, 1, 10)
    assert got["rows"] == []  # non-JSON grid body = no rows, not a crash
    assert page.grid_open


def test_adapter_sequential_pagination_guard(fake_playwright):
    fake_playwright(FakePage({"1": {"yes": _fixture_rows(25, "y")}}))
    adapter = C.playwright_page("https://svc.example.test/mhs/Home/QueryServiceOrg")
    t = C.PlaywrightTransport(page=adapter)
    t.fetch_page("1", True, 1, 10)
    with pytest.raises(RuntimeError, match="sequential"):
        t.fetch_page("1", True, 3, 10)


def test_playwright_absent_raises_declared_integration_point(monkeypatch):
    for name in ("playwright", "playwright.sync_api"):
        monkeypatch.setitem(sys.modules, name, None)  # force ImportError
    with pytest.raises(NotImplementedError, match="RecordedBrowserPage"):
        C.playwright_page("https://svc.example.test")
