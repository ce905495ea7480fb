"""Gherkin result-table runner for the reference's TCK feature files.

Parses `.feature` files from the read-only reference checkout
(`tests/tck/features/...`), extracts every `When executing/profiling
query` → `Then the result should be …` pair, executes the query through
our front end, and compares rows against the reference's expected table.
Plan-shape steps (`the execution plan should be`) are skipped by design:
Catalyst owns plan shapes (SURVEY §2 TCK-coverage note); result rows are
engine semantics and those are what this runner pins.

Comparison semantics (mirrors tests/common/comparator.py in the
reference, reduced to what our value model carries):

* scalars compare exactly (floats with 1e-6 tolerance, int/float
  numerically);
* ``EMPTY`` and ``NULL`` both compare equal to our SQL NULL — the
  reference's EMPTY-vs-NULL split collapses onto NULL here (documented
  deviation, README);
* a ``/regex/`` cell fullmatches the rendered actual value;
* vertices compare on vid — our bare-bind structs are Catalyst-pruned
  to the fields the query actually reads, so prop maps in expected
  vertex literals are fixture data already pinned by the hand
  transcriptions (test_tck_goldens), not by this runner;
* edges compare on (src, dst, rank) and, when both sides carry one, the
  edge type and any prop whose name our struct carries;
* paths compare start vid + per-hop (direction, type, rank, dst vid).

Tables match as multisets ("in any order") or sequences ("in order");
column headers must equal ``df.columns`` exactly.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# expected-value parser (the TCK's value grammar, recursive descent)
# ---------------------------------------------------------------------------


class Regex:
    def __init__(self, pat: str):
        self.pat = pat

    def __repr__(self):
        return f"/{self.pat}/"


@dataclass(frozen=True)
class Vertex:
    vid: object
    tags: tuple = ()          # ((tag, props-dict-as-tuple), ...)


@dataclass(frozen=True)
class Edge:
    etype: object             # None = unspecified
    src: object               # None = unspecified
    dst: object
    rank: object
    props: tuple = ()


@dataclass(frozen=True)
class Path:
    start: Vertex
    hops: tuple               # ((dir 'F'|'R', Edge, Vertex), ...)


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def peek(self):
        self.ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, tok: str):
        self.ws()
        if not self.s.startswith(tok, self.i):
            raise ValueError(f"expected {tok!r} at {self.s[self.i:]!r}")
        self.i += len(tok)

    def try_eat(self, tok: str) -> bool:
        self.ws()
        if self.s.startswith(tok, self.i):
            self.i += len(tok)
            return True
        return False

    def ident(self) -> str:
        self.ws()
        m = re.match(r"[A-Za-z_][A-Za-z_0-9]*", self.s[self.i:])
        if not m:
            raise ValueError(f"expected ident at {self.s[self.i:]!r}")
        self.i += m.end()
        return m.group(0)

    def string(self) -> str:
        self.ws()
        q = self.s[self.i]
        assert q in "\"'"
        self.i += 1
        out = []
        while self.s[self.i] != q:
            c = self.s[self.i]
            if c == "\\":
                self.i += 1
                c = self.s[self.i]
                c = {"n": "\n", "t": "\t"}.get(c, c)
            out.append(c)
            self.i += 1
        self.i += 1
        return "".join(out)

    def number(self):
        self.ws()
        m = re.match(r"-?\d+\.\d+(?:[eE][-+]?\d+)?|-?\d+[eE][-+]?\d+|-?\d+",
                     self.s[self.i:])
        if not m:
            raise ValueError(f"expected number at {self.s[self.i:]!r}")
        self.i += m.end()
        t = m.group(0)
        return float(t) if ("." in t or "e" in t or "E" in t) else int(t)

    # ---- composite values ----

    def value(self):
        c = self.peek()
        if c == "/":
            j = self.s.rindex("/")
            pat = self.s[self.i + 1:j]
            self.i = j + 1
            return Regex(pat)
        if c in "\"'":
            return self.string()
        if c == "[":
            # edge literal iff a ':' follows the '['
            save = self.i
            self.i += 1
            if self.peek() == ":":
                self.i = save
                return self.edge()
            self.i = save
            return self.list_()
        if c == "(":
            return self.vertex()
        if c == "<":
            return self.path()
        if c == "{":
            return self.map_or_set()
        if c == "-" or c.isdigit():
            if self.s[self.i:self.i + 4] == "-inf":
                self.i += 4
                return float("-inf")
            return self.number()
        w = self.ident()
        lw = w.lower()
        if lw == "null":
            if self.try_eat("("):          # NULL(OUT_OF_RANGE) etc.
                self.ident()
                self.eat(")")
            return None
        if lw in ("empty", "bad_type", "bad_data", "div_by_zero",
                  "out_of_range", "err_overflow", "unknown_prop",
                  "__null__"):
            return None        # every NULL flavor folds onto SQL NULL
        if lw == "true":
            return True
        if lw == "false":
            return False
        if lw == "nan":
            return float("nan")
        if lw == "inf":
            return float("inf")
        raise ValueError(f"unknown bare word {w!r}")

    def list_(self):
        self.eat("[")
        out = []
        if not self.try_eat("]"):
            out.append(self.value())
            while self.try_eat(","):
                out.append(self.value())
            self.eat("]")
        return out

    def map_or_set(self):
        self.eat("{")
        if self.try_eat("}"):
            return {}
        save = self.i
        # map iff `key:` prefix (ident or string key then ':')
        try:
            if self.peek() in "\"'":
                self.string()
            else:
                self.ident()
            is_map = self.try_eat(":")
        except ValueError:
            is_map = False
        self.i = save
        if is_map:
            d = {}
            while True:
                k = self.string() if self.peek() in "\"'" else self.ident()
                self.eat(":")
                d[k] = self.value()
                if not self.try_eat(","):
                    break
            self.eat("}")
            return d
        out = []                           # sets compare as any-order lists
        out.append(self.value())
        while self.try_eat(","):
            out.append(self.value())
        self.eat("}")
        return ("SET", tuple(out))

    def vertex(self) -> Vertex:
        self.eat("(")
        vid = None
        c = self.peek()
        if c in "\"'":
            vid = self.string()
        elif c == "-" or c.isdigit():
            vid = self.number()
        tags = []
        while self.try_eat(":"):
            t = self.ident()
            props = {}
            if self.peek() == "{":
                props = self.map_or_set()
            tags.append((t, tuple(sorted(props.items()))))
        self.eat(")")
        return Vertex(vid, tuple(tags))

    def edge(self) -> Edge:
        self.eat("[")
        etype = None
        if self.try_eat(":"):
            etype = self.ident()
        src = dst = None

        def _arrow():
            # `"a"->"b"` is an edge a→b; `"a"<-"b"` the stored edge b→a
            # (VariableLengthPattern.feature reversed-hop cells)
            if self.try_eat("<-"):
                return True
            self.eat("->")
            return False
        if self.peek() in "\"'":
            src = self.string()
            rev = _arrow()
            dst = self.string() if self.peek() in "\"'" else self.number()
            if rev:
                src, dst = dst, src
        elif self.peek().isdigit() or (self.peek() == "-"
                                       and not self.s.startswith(
                                           "->", self.i)):
            src = self.number()
            rev = _arrow()
            dst = self.string() if self.peek() in "\"'" else self.number()
            if rev:
                src, dst = dst, src
        rank = None
        if self.try_eat("@"):
            rank = self.number()
        props = {}
        if self.peek() == "{":
            props = self.map_or_set()
        self.eat("]")
        return Edge(etype, src, dst, rank, tuple(sorted(props.items())))

    def path(self) -> Path:
        self.eat("<")
        start = self.vertex()
        hops = []
        while True:
            if self.try_eat("<-"):
                e = self.edge()
                self.eat("-")
                v = self.vertex()
                hops.append(("R", e, v))
            elif self.try_eat("-"):
                e = self.edge()
                self.eat("->")
                v = self.vertex()
                hops.append(("F", e, v))
            else:
                break
        self.eat(">")
        return Path(start, tuple(hops))


def parse_cell(text: str):
    text = text.strip()
    if text == "":
        return ""
    p = _P(text)
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise ValueError(f"trailing input in cell {text!r}: {p.s[p.i:]!r}")
    return v


# ---------------------------------------------------------------------------
# feature-file parser
# ---------------------------------------------------------------------------


@dataclass
class Assertion:
    query: str
    mode: str                  # 'any' | 'order' | 'count'
    header: list
    rows: list                 # list[list[raw cell str]]
    line: int
    params: dict | None = None


@dataclass
class ErrorAssertion:
    query: str
    line: int
    params: dict | None = None


@dataclass
class WaitStep:
    """`And wait N seconds` — a real sleep where semantics depend on it
    (TTL expiration); parsed as a step so it runs between assertions."""
    seconds: int
    line: int
    query: str | None = None
    params: dict | None = None


@dataclass
class TryQuery:
    """`When try to execute query:` — run, outcome ignored (the corpus
    uses it for cleanup/best-effort steps)."""
    query: str
    line: int
    params: dict | None = None


@dataclass
class Scenario:
    feature: str
    name: str
    space: str | None = None
    setup: list = field(default_factory=list)   # DDL scripts to run first
    fresh_space: str | None = None  # 'nba' → build a throwaway copy
    new_space: dict | None = None   # 'create a space with options' table
    asserts: list = field(default_factory=list)
    unsupported: str | None = None  # step we can't drive → skip reason
    tags: tuple = ()                # gherkin @tags (@skip honored upstream)
    skipped_asserts: int = 0        # hashed-column tables we can't compare


def _split_table_row(line: str) -> list[str]:
    # cells are |-delimited; no escaped pipes in the corpus
    parts = line.strip().strip("|").split("|")
    return [p.strip() for p in parts]


def _expand_outlines(lines: list[str]) -> list[str]:
    """Expand ``Scenario Outline`` + ``Examples:`` into one plain
    ``Scenario: <name> [k]`` per data row, substituting ``<var>``
    placeholders everywhere in the body (queries, expected tables,
    setup). Outlines WITHOUT a per-scenario Examples table (SeekByEdge's
    feature-level ``space_name`` style) pass through unchanged and keep
    riding the ``space_subs`` substitution."""
    out: list[str] = []
    i, n = 0, len(lines)
    sc_re = re.compile(r"^(\s*)scenario(\s+outline)?\s*:", re.I)
    while i < n:
        m = sc_re.match(lines[i])
        if not (m and m.group(2)):
            out.append(lines[i])
            i += 1
            continue
        j = i + 1
        while j < n and not sc_re.match(lines[j]) \
                and not re.match(r"\s*feature\s*:", lines[j], re.I):
            j += 1
        # tags directly above the NEXT scenario belong to it, not here
        while j > i + 1 and lines[j - 1].strip().startswith("@"):
            j -= 1
        chunk = lines[i:j]
        body: list[str] = []
        examples: list[tuple[list, list]] = []
        k = 0
        while k < len(chunk):
            if re.match(r"\s*examples\s*:\s*$", chunk[k], re.I):
                k += 1
                tbl = []
                while k < len(chunk) and chunk[k].strip().startswith("|"):
                    tbl.append(_split_table_row(chunk[k]))
                    k += 1
                if len(tbl) > 1:
                    examples.append((tbl[0], tbl[1:]))
            else:
                body.append(chunk[k])
                k += 1
        if not examples:
            out.extend(chunk)
            i = j
            continue
        # tag lines directly above the outline apply to every copy
        tags: list[str] = []
        while out and out[-1].strip().startswith("@"):
            tags.insert(0, out.pop())
        head = re.sub(r"(?i)outline\s*:", ":", body[0], count=1)
        cnt = 0
        for header, rows in examples:
            for row in rows:
                cnt += 1
                sub = dict(zip(header, row))
                out.extend(tags)
                out.append(f"{head} [{cnt}]")
                for bl in body[1:]:
                    for kk, vv in sub.items():
                        bl = bl.replace(f"<{kk}>", vv)
                    out.append(bl)
        i = j
    return out


def _feature_examples(lines: list[str]):
    """A FEATURE-level Examples table (before any Scenario) applies to
    the whole file — LookupTag2's vid_type/id rows template the
    Background itself, so the file parses once per row."""
    sc_re = re.compile(r"^\s*scenario(\s+outline)?\s*:", re.I)
    j, n = 0, len(lines)
    while j < n and not sc_re.match(lines[j]):
        if re.match(r"\s*examples\s*:\s*$", lines[j], re.I):
            j += 1
            tbl = []
            while j < n and lines[j].strip().startswith("|"):
                tbl.append(_split_table_row(lines[j]))
                j += 1
            if len(tbl) > 1:
                return tbl[0], tbl[1:]
            return None
        j += 1
    return None


def parse_feature(path: str, space_subs: dict | None = None) -> list[Scenario]:
    """Parse one feature file into Scenarios ready to run.

    ``space_subs`` maps outline variables (e.g. ``space_name``) to a
    substitution. A feature-level Examples table re-parses the whole
    file once per data row (each row templates the Background too).
    """
    with open(path) as f:
        raw = f.read().splitlines()
    feat = _feature_examples(raw) if space_subs is None else None
    if feat:
        header, rows = feat
        out: list[Scenario] = []
        for k, row in enumerate(rows, 1):
            subs = dict(zip(header, row))
            subs.setdefault("space_name", "nba")
            for sc in parse_feature(path, subs):
                if len(rows) > 1:
                    sc.name += f" [f{k}]"
                out.append(sc)
        return out
    lines = _expand_outlines(raw)
    subs = space_subs or {"space_name": "nba"}
    # substitute TEMPLATE variables everywhere up front — docstring
    # bodies are read verbatim by read_docstring, so the per-step-line
    # replace below never reaches a `<where_condition>` inside a query
    def _sub_all(ln: str) -> str:
        for k, v in subs.items():
            ln = ln.replace(f"<{k}>", v)
        return ln
    lines = [_sub_all(ln) for ln in lines]

    scenarios: list[Scenario] = []
    background: list[tuple] = []   # steps shared by every scenario
    cur: Scenario | None = None
    cur_steps: list[tuple] | None = None
    in_background = False
    pending_tags: tuple = ()
    i = 0
    n = len(lines)

    def read_docstring(i):
        assert lines[i].strip() in ('"""', "'''")
        out = []
        i += 1
        while lines[i].strip() not in ('"""', "'''"):
            out.append(lines[i])
            i += 1
        return "\n".join(out), i + 1

    def read_table(i):
        rows = []
        while i < n and lines[i].strip().startswith("|"):
            rows.append(_split_table_row(lines[i]))
            i += 1
        return rows, i

    # first pass: collect raw steps per scenario
    raw: list[tuple] = []       # (kind, payload, line)
    while i < n:
        line = lines[i].strip()
        for k, v in subs.items():
            line = line.replace(f"<{k}>", v)
        low = line.lower()
        if low.startswith("background"):
            in_background = True
            cur_steps = background
            i += 1
            continue
        if low.startswith("@"):
            pending_tags += tuple(w for w in line.split() if w.startswith("@"))
            i += 1
            continue
        if low.startswith("scenario"):
            name = line.split(":", 1)[1].strip() if ":" in line else line
            cur = Scenario(feature=path.rsplit("/", 1)[-1], name=name,
                           tags=pending_tags)
            pending_tags = ()
            scenarios.append(cur)
            cur_steps = []
            cur.raw_steps = cur_steps      # type: ignore[attr-defined]
            in_background = False
            i += 1
            continue
        if cur_steps is None or not line or line.startswith("#") \
                or low.startswith(("feature:", "examples:", "@")) \
                or (line.startswith("|") and cur_steps is background
                    and not background):
            # feature-level Examples table rows land here too
            if line.startswith("|") and not low.startswith("examples"):
                pass
            i += 1
            continue

        if re.match(r"(given|and)\s+a graph with space named", low):
            m = re.search(r'"([^"]+)"', line)
            cur_steps.append(("space", m.group(1), i + 1))
            i += 1
        elif re.match(r"(given|and)\s+an empty graph", low):
            cur_steps.append(("empty", None, i + 1))
            i += 1
        elif re.match(r"(given|and)\s+load \"(\w+)\" csv data", low):
            m = re.search(r'load "(\w+)" csv', line)
            cur_steps.append(("fresh", m.group(1), i + 1))
            i += 1
        elif re.match(r"(given|and)\s+parameters: ", low):
            import json
            cur_steps.append(("params",
                              json.loads(line.split(":", 1)[1]), i + 1))
            i += 1
        elif "clear the used parameters" in low:
            cur_steps.append(("params", {}, i + 1))
            i += 1
        elif re.match(r"(given|and|when)\s+having executed:", low):
            doc, i2 = read_docstring(i + 1)
            cur_steps.append(("setup", doc, i + 1))
            i = i2
        elif re.match(r"(when|and)\s+(executing|profiling) query"
                      r"( and retrying.*)?:", low):
            doc, i2 = read_docstring(i + 1)
            cur_steps.append(("query", doc, i + 1))
            i = i2
        elif re.match(r"(when|and)\s+try(ing)? to execute query:", low):
            doc, i2 = read_docstring(i + 1)
            cur_steps.append(("try_query", doc, i + 1))
            i = i2
        elif re.match(r"(given|and)\s+create a space with following "
                      r"options:", low):
            tbl, i2 = read_table(i + 1)
            opts = {r[0]: r[1] for r in tbl}
            cur_steps.append(("new_space", opts, i + 1))
            i = i2
        elif "should be hashed" in low and "result should be" in low:
            # `…and the columns N should be hashed`: expected cells are
            # the reference's murmur hashes of rendered values — not
            # comparable against our value model; count + column check
            tbl, i2 = read_table(i + 1)
            mode = "order" if ", in order" in low else "any"
            cur_steps.append(("result_hashed", (mode, tbl), i + 1))
            i = i2
        elif "the result should be" in low:
            mode = "order" if ", in order" in low else "any"
            tbl, i2 = read_table(i + 1)
            cur_steps.append(("result", (mode, tbl), i + 1))
            i = i2
        elif "the execution plan should be" in low:
            tbl, i2 = read_table(i + 1)   # consumed, ignored by design
            cur_steps.append(("plan", None, i + 1))
            i = i2
        elif "should be raised" in low:
            cur_steps.append(("error", line, i + 1))
            i += 1
        elif re.match(r"(and|then)\s+wait \d+ seconds", low):
            m = re.search(r"wait (\d+) seconds", low)
            cur_steps.append(("wait", int(m.group(1)), i + 1))
            i += 1
        elif "drop the used space" in low:
            i += 1                        # throwaway spaces are per-test
        elif "no side effects" in low:
            i += 1                        # storage-side assertion — n/a
        elif "the execution should be successful" in low:
            cur_steps.append(("ok", None, i + 1))
            i += 1
        elif line.startswith("|"):
            i += 1                        # stray Examples row
        else:
            cur_steps.append(("unsupported", line, i + 1))
            i += 1

    # second pass: fold raw steps into runnable scenarios
    for sc in scenarios:
        steps = background + getattr(sc, "raw_steps", [])
        query = None
        params = None
        q_used = True

        def _flush_pending(ln2):
            # a `When executing query` with NO Then step still EXECUTES
            # in the reference's runner (FetchEmpty.feature's CREATE TAG
            # before `And wait 5 seconds`) — emit a bare execute
            if query is not None and not q_used:
                sc.asserts.append(Assertion(query, "any", None, None,
                                            ln2, params))
        for kind, payload, ln in steps:
            if kind in ("query", "try_query"):
                _flush_pending(ln)
            if kind == "space":
                sc.space = payload
            elif kind == "empty":
                # a scenario-level `Given an empty graph` RESETS the
                # lifecycle: background setups targeted the replaced
                # space (Insert.feature "… ignore existed index" re-runs
                # CREATE TAG person in ITS fresh space)
                sc.space = None
                sc.setup = []
            elif kind == "fresh":
                sc.fresh_space = payload
            elif kind == "setup":
                sc.setup.append(payload)
            elif kind == "new_space":
                sc.new_space = payload
            elif kind == "query":
                query = payload
                q_used = False
            elif kind == "params":
                params = payload or None
            elif kind == "try_query":
                query = payload
                q_used = True
                sc.asserts.append(TryQuery(payload, ln, params))
            elif kind == "result_hashed":
                mode, tbl = payload
                q_used = True
                if tbl:
                    sc.asserts.append(Assertion(
                        query, "count", tbl[0], tbl[1:], ln, params))
                    sc.skipped_asserts += 1
            elif kind == "result":
                mode, tbl = payload
                q_used = True
                if not tbl:
                    raise ValueError(f"{path}:{ln} result step w/o table")
                if query is not None and "order by" not in query.lower():
                    ql = query.lower()
                    if mode == "order":
                        # the reference pins its own operators' emission
                        # order; without ORDER BY that order is undefined
                        # (openCypher CIP) — compare as a multiset
                        mode = "any"
                    if re.search(r"\b(limit|sample)\b", ql):
                        # LIMIT/SAMPLE without ORDER BY: WHICH rows
                        # survive is undefined too — the reference's
                        # table pins its storage iteration order; only
                        # the row count is semantics
                        mode = "count"
                sc.asserts.append(Assertion(
                    query, mode, tbl[0], tbl[1:], ln, params))
            elif kind == "error":
                q_used = True
                sc.asserts.append(ErrorAssertion(query, ln, params))
            elif kind == "wait":
                sc.asserts.append(WaitStep(payload, ln))
            elif kind == "ok":
                q_used = True
                if sc.asserts and isinstance(sc.asserts[-1], TryQuery) \
                        and sc.asserts[-1].query == query:
                    # `try to execute` + `should be successful`: run
                    # once, success required — don't execute twice
                    sc.asserts[-1] = Assertion(query, "any", None, None,
                                               ln, params)
                elif query is not None:
                    sc.asserts.append(Assertion(query, "any", None, None,
                                                ln, params))
            elif kind == "plan":
                pass
            elif kind == "unsupported":
                sc.unsupported = payload
        _flush_pending(sc.asserts[-1].line if sc.asserts else 0)
    return scenarios


# ---------------------------------------------------------------------------
# canonicalization + comparison
# ---------------------------------------------------------------------------


def canon_actual(v):
    """Reduce a collected Spark value to the comparable form."""
    try:
        from pyspark.sql import Row
    except ImportError:                    # pragma: no cover
        Row = ()
    if v is None:
        return None
    import datetime as _dt
    if isinstance(v, _dt.datetime):
        # DateTime renders ISO-with-T and microseconds
        # (FunctionCall.feature pins /^\d{4}-\d{2}-\d{2}T…\.\d{6}$/)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, Row):
        d = v.asDict()
        if set(d) == {"hour", "minute", "sec"}:
            # TIME value struct → the reference's HH:MM:SS.ffffff
            return "%02d:%02d:%09.6f" % (d["hour"], d["minute"],
                                         float(d["sec"]))
        if "start" in d and "path" in d:   # FIND PATH value convention
            d = {"start": d["start"], "hops": d["path"]}
        if "start" in d and "hops" in d:
            hops = []
            for h in d["hops"]:
                hd = h.asDict() if isinstance(h, Row) else dict(h)
                direction = "F" if hd.get("t", 1) >= 0 else "R"
                props = tuple(sorted(
                    (k, canon_actual(x)) for k, x in hd.items()
                    if k not in ("s", "d", "r", "t", "et")))
                hops.append((direction,
                             Edge(hd.get("et"), None, None,
                                  hd.get("r"), props),
                             Vertex(hd.get("d"))))
            return Path(Vertex(d["start"]), tuple(hops))
        if "vid" in d:
            props = tuple(sorted((k, canon_actual(x))
                                 for k, x in d.items() if k != "vid"))
            return Vertex(d["vid"], (("", dict(props)),) if props else ())
        if {"s", "d", "r"} <= set(d):
            props = tuple(sorted(
                (k, canon_actual(x)) for k, x in d.items()
                if k not in ("s", "d", "r", "t", "et")))
            s, dd = d["s"], d["d"]
            if d.get("t") is not None and d["t"] < 0:
                s, dd = dd, s          # reversed hop → canonical edge
            return Edge(d.get("et"), s, dd, d["r"], props)
        if {"src", "dst"} <= set(d):   # FETCH `edge AS e` value struct
            props = tuple(sorted(
                (k, canon_actual(x)) for k, x in d.items()
                if k not in ("src", "dst", "_rank", "rank", "_type",
                             "type", "_etype")))
            return Edge(d.get("_etype") or d.get("type"), d["src"],
                        d["dst"], d.get("_rank", d.get("rank", 0)), props)
        return ("MAP", tuple(sorted((k, canon_actual(x))
                                    for k, x in d.items())))
    if isinstance(v, dict):
        return ("MAP", tuple(sorted((k, canon_actual(x))
                                    for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        return ("LIST", tuple(canon_actual(x) for x in v))
    return v


def _num_eq(a, b) -> bool:
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    # IEEE-754 specials render as table cells `nan`/`inf`/`-inf`
    # (NaNInfinityFloat.feature) — compare identity-wise, not by
    # difference (nan - nan is nan, inf - inf is nan)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    if math.isinf(fa) or math.isinf(fb):
        return fa == fb
    return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def values_match(exp, act) -> bool:
    """Expected (parsed TCK value) vs actual (canon_actual output)."""
    if isinstance(exp, Regex):
        return re.fullmatch(exp.pat, _render(act)) is not None
    if exp is None:
        return act is None
    if exp == "" and act is None:
        # a blank table cell is the reference's EMPTY rendering
        # (GO.feature "multi edges over all": serve._dst on a like row)
        return True
    if isinstance(exp, bool) or isinstance(act, bool):
        return exp is act if isinstance(exp, bool) and isinstance(act, bool) \
            else False
    if isinstance(exp, (int, float)) and isinstance(act, (int, float)):
        return _num_eq(exp, act)
    if isinstance(exp, (int, float)) and isinstance(act, str):
        # a single-typed Spark column (DESC's Default, UNION of mixed
        # types) renders numbers as their canonical string where the
        # reference's dynamic Value column keeps the int — accept the
        # EXACT canonical rendering only (documented deviation)
        return act == str(exp)
    if isinstance(exp, str):
        return exp == act
    if isinstance(exp, Vertex):
        if isinstance(act, (str, int)) and not isinstance(act, bool):
            # a bare vid IS our vertex identity where the engine's
            # pruned model carries no struct (collect(v2) of an
            # unread-props bind — Agg.feature Basic Aggregate)
            return _loose_eq(exp.vid, act)
        if not isinstance(act, Vertex):
            return False
        if exp.vid is not None and not _loose_eq(exp.vid, act.vid):
            return False
        # props: check the intersection our pruned struct carries
        act_props = dict(act.tags[0][1]) if act.tags else {}
        for _tag, props in exp.tags:
            for k, pv in props:
                if k in act_props and not values_match(pv, act_props[k]):
                    return False
        return True
    if isinstance(exp, Edge):
        if not isinstance(act, Edge):
            return False
        if exp.etype is not None and act.etype is not None \
                and exp.etype != act.etype:
            return False
        if exp.src is not None and not _loose_eq(exp.src, act.src):
            return False
        if exp.dst is not None and not _loose_eq(exp.dst, act.dst):
            return False
        # a cell WITHOUT @rank leaves the rank UNCHECKED — the corpus
        # relies on it for parallel edges (VariableLengthPattern.feature
        # lists two identical `"MB"->"Hornets"` cells, one per rank);
        # tables that pin a rank spell @0/@1 explicitly
        if exp.rank is not None and act.rank is not None \
                and not _num_eq(exp.rank, act.rank):
            return False
        act_props = dict(act.props)
        for k, pv in exp.props:
            if k in act_props and not values_match(pv, act_props[k]):
                return False
        return True
    if isinstance(exp, Path):
        if not isinstance(act, Path):
            # a pattern-expression VALUE arrives as a plain hop list
            # (array of edge structs — PathExpr.feature "In Return"):
            # chain the canonical edges back into a Path for comparison
            if isinstance(act, tuple) and act and act[0] == "LIST" \
                    and act[1] and len(act[1]) == len(exp.hops) \
                    and all(isinstance(x, Edge) for x in act[1]):
                act = _edges_to_path(act[1])
            if not isinstance(act, Path):
                return False
        # the reference's renderer may assemble the SAME result path
        # from either end depending on which node FindStart seeded
        # (BuildPathMistake.feature pins the cycle row reversed while
        # its siblings render forward) — accept either rendering
        return _path_match(exp, act) or _path_match(exp, _rev_path(act))
    if isinstance(exp, tuple) and exp and exp[0] == "SET":
        if not (isinstance(act, tuple) and act and act[0] == "LIST"):
            return False
        return _multiset_match(list(exp[1]), list(act[1]))
    if isinstance(exp, list):
        if not (isinstance(act, tuple) and act and act[0] == "LIST"):
            return False
        if len(exp) != len(act[1]):
            return False
        if all(values_match(e, a) for e, a in zip(exp, act[1])):
            return True
        # collect()-built lists have no defined element order (the
        # table pins the reference's accumulation order) — fall back to
        # a multiset match; ordered list semantics stay pinned by the
        # hand goldens
        return _multiset_match(exp, list(act[1]))
    if isinstance(exp, dict):
        if not (isinstance(act, tuple) and act and act[0] == "MAP"):
            return False
        am = dict(act[1])
        if set(exp) != set(am):
            return False
        return all(values_match(v, am[k]) for k, v in exp.items())
    return False


def _edges_to_path(edges) -> "Path | None":
    """Chain canonical (src, dst)-bearing edges into a traversal Path:
    try each end of the first edge as the start, follow F/R hops."""
    for start in (edges[0].src, edges[0].dst):
        cur, hops, ok = start, [], True
        for a in edges:
            if _loose_eq(a.src, cur):
                hops.append(("F", Edge(a.etype, None, None, a.rank,
                                       a.props), Vertex(a.dst)))
                cur = a.dst
            elif _loose_eq(a.dst, cur):
                hops.append(("R", Edge(a.etype, None, None, a.rank,
                                       a.props), Vertex(a.src)))
                cur = a.src
            else:
                ok = False
                break
        if ok:
            return Path(Vertex(start), tuple(hops))
    return None


def _rev_path(p: Path) -> Path:
    """The same path rendered from its other end: reversed hop order,
    flipped hop directions, node sequence shifted by one."""
    nodes = [p.start] + [v for _d, _e, v in p.hops]
    hops = []
    for i in range(len(p.hops) - 1, -1, -1):
        d, e, _v = p.hops[i]
        hops.append(("R" if d == "F" else "F", e, nodes[i]))
    return Path(nodes[-1], tuple(hops))


def _path_match(exp: Path, act: Path) -> bool:
    if not values_match(exp.start, act.start):
        return False
    if len(exp.hops) != len(act.hops):
        return False
    cur = exp.start.vid
    for (ed, ee, ev), (ad, ae, av) in zip(exp.hops, act.hops):
        # a self-loop hop has no observable direction (the reference
        # renders whichever entry it read — NoLoop.feature self-loop)
        if ed != ad and ev.vid != cur:
            return False
        if not values_match(ee, ae) or not values_match(ev, av):
            return False
        cur = ev.vid
    return True


def _loose_eq(a, b) -> bool:
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return _num_eq(a, b)
    return a == b


def _bipartite_match(exp_rows: list, act_rows: list, match_fn) -> bool:
    """Perfect matching between expected and actual rows. GREEDY
    first-fit is order-sensitive once cells carry wildcards (an edge
    without @rank matches several actuals) — a wildcard row can consume
    the only actual a LATER pinned row accepts. Augmenting paths find a
    perfect matching whenever one exists (rows are few; O(V·E) is
    nothing here)."""
    if len(exp_rows) != len(act_rows):
        return False
    adj = [[j for j, a in enumerate(act_rows) if match_fn(e, a)]
           for e in exp_rows]
    owner = [-1] * len(act_rows)

    def aug(i, seen):
        for j in adj[i]:
            if not seen[j]:
                seen[j] = True
                if owner[j] == -1 or aug(owner[j], seen):
                    owner[j] = i
                    return True
        return False
    return all(aug(i, [False] * len(act_rows))
               for i in range(len(exp_rows)))


def _multiset_match(exp_rows: list, act_rows: list) -> bool:
    return _bipartite_match(exp_rows, act_rows, values_match)


def run_assertion(space, a, execute):
    """Run one Assertion/ErrorAssertion; raise AssertionError on mismatch."""
    kw = {"params": a.params} if a.params else {}
    if isinstance(a, WaitStep):
        # advance the LOGICAL clock (now() + TTL reads, see
        # scalar.NOW_OVERRIDE) by exactly the waited seconds — no real
        # sleep: every time-sensitive read goes through the override, so
        # the reference's second-granular TTL scenarios are deterministic
        # and the index-settle waits (which our engine doesn't need)
        # cost nothing
        import time
        from nebula_spark.functions import scalar as _sc
        if _sc.NOW_OVERRIDE[0] is None:
            _sc.NOW_OVERRIDE[0] = int(time.time())
        _sc.NOW_OVERRIDE[0] += a.seconds
        return
    if isinstance(a, TryQuery):
        try:
            execute(space, a.query, **kw).collect()
        except Exception:
            pass
        return
    if isinstance(a, ErrorAssertion):
        try:
            execute(space, a.query, **kw).collect()
        except Exception:
            return
        raise AssertionError(
            f"line {a.line}: expected an error for {a.query!r}")
    df = execute(space, a.query, **kw)
    if a.header is None:                  # bare "should be successful"
        df.collect()
        return
    assert df.columns == a.header, (
        f"line {a.line}: columns {df.columns} != expected {a.header}")
    actual = [[canon_actual(v) for v in row]
              for row in (tuple(r) for r in df.collect())]
    expected = [[parse_cell(c) for c in row] for row in a.rows]
    if a.mode == "count":
        ok = len(expected) == len(actual)
    elif a.mode == "order":
        ok = (len(expected) == len(actual) and all(
            _row_match(er, ar) for er, ar in zip(expected, actual)))
    else:
        ok = _ms(expected, actual)
    if not ok:
        raise AssertionError(
            f"line {a.line}: result mismatch for\n{a.query}\n"
            f"expected ({len(expected)} rows): {expected[:8]}\n"
            f"actual   ({len(actual)} rows): {actual[:8]}")


# row-tuple matching: cells pair positionally
def _row_match(er, ar) -> bool:
    return len(er) == len(ar) and all(
        values_match(e, a) for e, a in zip(er, ar))


def _ms(exp_rows, act_rows) -> bool:
    return _bipartite_match(exp_rows, act_rows, _row_match)
