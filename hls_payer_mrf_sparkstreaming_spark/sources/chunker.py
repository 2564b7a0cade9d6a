"""Byte-level splitter for giant single-object JSON files (CMS MRF).

CMS price-transparency files are one multi-GB JSON *object* whose bulk lives
in a few top-level arrays (``provider_references``, ``in_network``). Vanilla
``spark.read.json`` treats the whole file as one record and OOMs. This module
scans the raw bytes once, on the driver, and emits a **chunk manifest**:
``(start, end, header_key)`` byte ranges where each range is either

- a run of complete top-level-array elements (``header_key`` = the array's
  key), or
- a fragment of the surrounding header object (``header_key`` = ``""``).

Executors later re-read only their byte range (seek + read) and repair it
into standalone parseable JSON — so discovery is O(1) memory and execution
is embarrassingly parallel with zero shuffle.

Capability parity with the reference engine's splitter
(/root/reference/src/main/scala/com/databricks/ByteParser.scala:13-259 and
/root/reference/src/main/scala/com/databricks/JsonMRFSource.scala:74-178),
re-designed rather than ported:

- The hot path is a **numpy-vectorized structural scan** (quote parity via
  cumsum, escape handling via run-length of backslashes, depth via cumsum of
  bracket masks — the simdjson "stage 1" idea) instead of a per-byte loop,
  so pure-Python discovery sustains GB/s-class throughput.
- Elements/keys spanning buffer boundaries are handled by leftover-carry with
  exponential read growth (the reference punts with ``???`` at
  JsonMRFSource.scala:114).
- No 25-char key-length cap (reference ByteParser.scala:36).
- Array-element runs are capped at ``chunk_target_bytes`` (default 16 MB) so
  a 100 TB-scale job gets enough partitions for 1000 executors, instead of
  one 256 MB row per buffer-fill like the reference.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import BinaryIO, Iterator

import numpy as np

EOB = -2  # "end of buffer" sentinel, same contract as reference ByteParser

_WS = b" \t\r\n"
_NON_WS = re.compile(rb"[^ \t\r\n]")
_NON_WS_COMMA = re.compile(rb"[^ \t\r\n,]")
_STRUCTURAL = re.compile(rb'["{}\[\]]')
_SCALAR_END = re.compile(rb"[,\]\}]")

DEFAULT_CHUNK_TARGET = 16 * 1024 * 1024
# 3 MB measured fastest for the threaded discovery scan (r11 sweep over
# 1-32 MB: 3 MB = 34.7 GB/min vs 23.4 at 8 MB on this hardware) — small
# enough that a block's classify pass stays cache-resident while the
# prefetch thread fills the next ones, large enough to amortize syscalls.
# Overridable per read via the `buffersize` source option.
DEFAULT_READ_SIZE = 3 * 1024 * 1024


class MalformedMRFError(ValueError):
    """Input is not a parseable top-level JSON object."""


@dataclass(frozen=True)
class Chunk:
    """A byte range of the source file. ``end`` is inclusive.

    ``header_key == ""`` marks a header-object fragment; otherwise the key of
    the top-level array whose complete elements this range covers.
    ``n_elements`` is 0 for header fragments.
    """

    start: int
    end: int
    header_key: str
    n_elements: int = 0


# ---------------------------------------------------------------------------
# Scalar structural primitives (header-level navigation; small data only).
# ---------------------------------------------------------------------------


def skip_string(buf, i: int) -> int:
    """``buf[i]`` must be ``"``. Return index just after the closing quote,
    or EOB if the string is not terminated within ``buf``. Escape-aware."""
    j = i + 1
    while True:
        k = buf.find(b'"', j)
        if k < 0:
            return EOB
        b = k - 1
        while b >= 0 and buf[b] == 0x5C:  # backslash
            b -= 1
        if (k - 1 - b) % 2 == 0:  # even number of preceding backslashes
            return k + 1
        j = k + 1


def seek_matching_end(buf, i: int) -> int:
    """``buf[i]`` must be ``{`` or ``[``. Return the index of the matching
    closing bracket, or EOB. Quote- and escape-aware."""
    depth = 0
    pos = i
    n = len(buf)
    while pos < n:
        m = _STRUCTURAL.search(buf, pos)
        if m is None:
            return EOB
        j = m.start()
        c = buf[j]
        if c == 0x22:  # '"'
            nxt = skip_string(buf, j)
            if nxt == EOB:
                return EOB
            pos = nxt
        elif c in (0x7B, 0x5B):  # '{' '['
            depth += 1
            pos = j + 1
        else:  # '}' ']'
            depth -= 1
            if depth == 0:
                return j
            if depth < 0:
                raise MalformedMRFError(f"unbalanced bracket at byte {j}")
            pos = j + 1
    return EOB


def scalar_value_end(buf, i: int) -> int:
    """``buf[i]`` starts a non-composite, non-string JSON value (number,
    true/false/null). Return index of its last byte, or EOB."""
    m = _SCALAR_END.search(buf, i)
    if m is None:
        return EOB
    j = m.start() - 1
    while j > i and buf[j] in _WS:
        j -= 1
    return j


# ---------------------------------------------------------------------------
# Vectorized structural scan (array-interior hot path).
# ---------------------------------------------------------------------------


# byte-class LUT: 0 none, 1 quote, 2 backslash, 3 open, 4 close-brace,
# 5 close-bracket, 6 comma
_CLS = np.zeros(256, np.uint8)
_CLS[0x22] = 1
_CLS[0x5C] = 2
_CLS[0x7B] = 3
_CLS[0x5B] = 3
_CLS[0x7D] = 4
_CLS[0x5D] = 5
_CLS[0x2C] = 6
# bool LUT for the full-window pass: on this numpy build, uint8-output ops
# over the whole window run ~15x slower than bool-output ones, so the hot
# path masks with a bool LUT and classifies only the compressed positions
_IS_STRUCTURAL = _CLS != 0

_EMPTY = (np.empty(0, np.int64), np.empty(0, np.int8))


def _classify(buf, start: int = 0):
    """Stage A of the structural scan: byte classification of
    ``buf[start:]``. Returns ``(pos, k)`` — int64 offsets (relative to
    ``start``) of every structural byte and its uint8 class from _CLS.

    STATE-FREE: the result depends only on the bytes, never on scan
    state, so blocks classified independently CONCATENATE exactly (with
    positions shifted) to the classification of the concatenated bytes.
    That property is what lets the scanner classify read-ahead blocks on
    worker threads (numpy releases the GIL for these passes) while the
    main thread consumes earlier ones."""
    a = np.frombuffer(memoryview(buf)[start:], dtype=np.uint8)
    if a.size == 0:
        return _EMPTY
    # compare-chain beats a LUT gather here: equality compares are SIMD
    # bool-output passes, while _IS_STRUCTURAL[a] is a per-byte gather
    mask = a == 0x22
    tmp = np.empty(a.size, bool)
    for b in (0x5C, 0x7B, 0x5B, 0x7D, 0x5D, 0x2C):
        np.equal(a, b, out=tmp)
        np.logical_or(mask, tmp, out=mask)
    pos = np.flatnonzero(mask)
    if pos.size == 0:
        return _EMPTY
    k = _CLS[np.take(a, pos)]
    return pos, k


def _structural_candidates(buf, start: int):
    """Scan ``buf[start:]`` assuming the scan starts OUTSIDE any string at
    relative depth 0 (i.e. at an element boundary inside a top-level array).

    Returns ``(pos, kind)`` int64/int8 arrays of *relative-to-start* offsets:
      kind 0 — ``,`` at depth 0 (element separator)
      kind 1 — ``}``/``]`` closing an element (depth returns to 0)
      kind 2 — ``]`` closing the surrounding array (depth -1)

    Bytes after an unterminated trailing string/element produce no false
    candidates: unterminated strings mask everything after them as in-string,
    unterminated composites keep depth > 0.

    Implementation note: one LUT pass classifies every byte (_classify),
    then all sequential math (quote parity, escape runs, bracket depth)
    runs in *compressed position space* — only over the structural
    characters (typically a few % of bytes) — because full-array cumsums
    are the dominant cost otherwise (_select_candidates).
    """
    pos, k = _classify(buf, start)
    if pos.size == 0:
        return _EMPTY
    return _select_candidates(pos, k)


def _select_candidates(pos, k):
    """Stage B of the structural scan: given stage-A classification
    arrays (any position space, assumed to start OUTSIDE a string at
    relative depth 0), resolve escapes, quote parity and bracket depth in
    compressed space and return the candidate ``(pos, kind)`` arrays in
    the SAME position space."""
    quote = k == 1
    if (k == 2).any():
        # escaped quote <=> immediately preceded by an odd-length run of
        # byte-adjacent backslashes
        bs = k == 2
        idx = np.arange(k.size, dtype=np.int64)
        adj = np.empty(k.size, bool)
        adj[0] = False
        adj[1:] = (pos[1:] - pos[:-1]) == 1
        prev_bs = np.empty(k.size, bool)
        prev_bs[0] = False
        prev_bs[1:] = bs[:-1]
        run_start = bs & ~(adj & prev_bs)
        last_start = np.maximum.accumulate(np.where(run_start, idx, -1))
        run_len = np.where(bs, idx - last_start + 1, 0)
        prev_run = np.empty(k.size, np.int64)
        prev_run[0] = 0
        prev_run[1:] = run_len[:-1]
        quote &= ~(adj & prev_bs & ((prev_run & 1) == 1))

    # NB: explicit dtype matters — cumsum over bool without one falls off
    # numpy's SIMD path (~100x slower on this build)
    cs = np.cumsum(quote, dtype=np.int32)
    outside = (cs & 1) == 0  # quote chars count themselves: open->inside
    opens = (k == 3) & outside
    closes = ((k == 4) | (k == 5)) & outside
    depth = np.cumsum(
        opens.view(np.int8) - closes.view(np.int8), dtype=np.int32
    )

    elem_close = closes & (depth == 0)
    arr_close = (k == 5) & closes & (depth == -1)
    sep_comma = (k == 6) & outside & (depth == 0)

    cand = elem_close | arr_close | sep_comma
    out_pos = pos[cand]
    kind = np.ones(out_pos.size, np.int8)
    kind[sep_comma[cand]] = 0
    kind[arr_close[cand]] = 2
    return out_pos, kind


# ---------------------------------------------------------------------------
# Read-ahead pipeline: the discovery scan used to be strictly sequential
# (read block -> classify -> select -> consume), so a 200 MB single-file
# cold ingest spent ~70% of its wall in stage A byte passes on one core.
# Stage A is state-free (see _classify), so a prefetch thread reads the
# NEXT blocks and hands them to a small classify pool while the main
# thread runs stage B + consumption of earlier ones. Deterministic:
# block classifications concatenate exactly to the sequential result.
# ---------------------------------------------------------------------------

def _to_abs(item, fstart: int):
    """Shift a stage-A classification from block-relative to absolute
    file offsets (done exactly once per block, at store time)."""
    pos, k = item
    if fstart and pos.size:
        pos = pos + np.int64(fstart)
    return pos, k


_PREFETCH_ENV = "SPARK_GRAFT_SCAN_PREFETCH"
_PREFETCH_MIN_READ = 1 << 20  # tiny read_size (tests) stays synchronous
_PREFETCH_DEPTH = 3
_CLASSIFY_POOL = None


def _classify_pool():
    global _CLASSIFY_POOL
    if _CLASSIFY_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _CLASSIFY_POOL = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="mrf-classify"
        )
    return _CLASSIFY_POOL


class _Prefetcher:
    """Owns the stream: reads read_size blocks ahead (bounded queue) and
    submits each to the classify pool. ``next_block()`` returns
    ``(data, future)`` or None at EOF/error. ``stop()`` unblocks and
    retires the reader thread (registered as a weakref finalizer on the
    scanner, so an abandoned generator can't park a thread forever)."""

    def __init__(self, stream, read_size: int, depth: int = _PREFETCH_DEPTH):
        import queue
        import threading

        self._stream = stream
        self._rs = read_size
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stopped = False
        self._t = threading.Thread(
            target=self._run, daemon=True, name="mrf-prefetch"
        )
        self._t.start()

    def _run(self):
        import queue

        sentinel = None  # None == clean EOF
        item = None
        try:
            # pool creation inside the try: if ThreadPoolExecutor itself
            # fails ("can't start new thread" on a loaded host) the
            # consumer still receives a sentinel instead of hanging on
            # an unbounded q.get() against a dead producer
            pool = _classify_pool()
            while not self._stopped:
                if item is None:
                    data = self._stream.read(self._rs)
                    if not data:
                        break
                    item = (data, pool.submit(_classify, data))
                try:
                    self._q.put(item, timeout=1.0)
                    item = None
                except queue.Full:
                    continue
        except Exception as exc:
            # mid-scan read failure: hand the REAL exception to the
            # consumer (next_block re-raises it) — presenting it as EOF
            # would surface as a misleading MalformedMRFError, or worse,
            # a silently truncated manifest treated as a clean scan
            sentinel = exc
        while not self._stopped:
            try:
                self._q.put(sentinel, timeout=1.0)
                return
            except queue.Full:
                continue

    def next_block(self):
        if self._stopped:
            return None
        item = self._q.get()
        if isinstance(item, BaseException):
            if self._stopped:
                # stop() closed the stream under the producer — the
                # resulting error is an artifact of abandonment, not data
                return None
            raise item
        return item

    def stop(self):
        self._stopped = True
        import queue

        try:  # unblock a producer parked on a full queue
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


# ---------------------------------------------------------------------------
# The scanner.
# ---------------------------------------------------------------------------


class ChunkScanner:
    """Single forward pass over a binary stream producing the chunk manifest.

    Only offsets are retained — payload bytes are dropped as soon as they are
    scanned, so memory is O(read buffer + current element).
    """

    def __init__(
        self,
        stream: BinaryIO,
        chunk_target_bytes: int = DEFAULT_CHUNK_TARGET,
        read_size: int = DEFAULT_READ_SIZE,
        prefetch: bool | None = None,
    ):
        self._stream = stream
        self._target = max(int(chunk_target_bytes), 1024)
        self._read_size = max(int(read_size), 64 * 1024)
        # bytearray: += extends in place (amortized) and del [:cut] is a
        # memmove — a bytes buffer would copy the whole tail on every fill
        # and drop. NB: nothing may hold a buffer export (memoryview/numpy
        # view) of _buf across _fill/_drop, or the resize raises BufferError.
        self._buf = bytearray()
        self._base = 0  # file offset of self._buf[0]
        self._eof = False
        self._pos = 0  # file offset, used to return position out of sub-scans
        # per-block stage-A classifications aligned with _buf, in FILE
        # offset space: [fstart, fend, item] where item is a Future (from
        # the classify pool) or a resolved (pos_abs int64, k uint8) pair
        self._cls_blocks: list[list] = []
        import os

        self._pf: _Prefetcher | None = None
        if prefetch is None:  # env is the default, not an override channel
            prefetch = os.environ.get(_PREFETCH_ENV, "1") != "0"
        self._prefetch = prefetch and self._read_size >= _PREFETCH_MIN_READ

    # -- buffer management --------------------------------------------------

    def _next_block(self):
        """One read_size block of input plus its (possibly pending)
        stage-A classification, or None at EOF."""
        if self._prefetch:
            if self._pf is None:
                import weakref

                self._pf = _Prefetcher(self._stream, self._read_size)
                weakref.finalize(self, _Prefetcher.stop, self._pf)
            return self._pf.next_block()
        data = self._stream.read(self._read_size)
        if not data:
            return None
        return data, _classify(data)

    def _fill(self, want: int | None = None) -> bool:
        if self._eof:
            return False
        need = want or self._read_size
        got = 0
        while got < need:
            blk = self._next_block()
            if blk is None:
                self._eof = True
                break
            data, item = blk
            fstart = self._base + len(self._buf)
            self._buf += data
            if isinstance(item, tuple):  # inline path: normalize now
                item = _to_abs(item, fstart)
            self._cls_blocks.append([fstart, fstart + len(data), item])
            got += len(data)
            if want is None:
                break  # default fill: one block, like the old single read
        return got > 0

    def _drop(self, upto: int) -> None:
        cut = upto - self._base
        if cut > 0:
            del self._buf[:cut]
            self._base = upto
            while self._cls_blocks and self._cls_blocks[0][1] <= upto:
                self._cls_blocks.pop(0)

    def _candidates(self, fpos: int):
        """Structural candidates for ``self._buf`` from file offset
        ``fpos`` (callers guarantee ``fpos == self._base``), served from
        the per-block stage-A cache: resolve pending classify futures,
        slice at ``fpos``, concatenate, and run stage B once. Returns
        buffer-relative (pos, kind) — identical to
        ``_structural_candidates(self._buf, fpos - self._base)``."""
        parts_p: list = []
        parts_k: list = []
        for blk in self._cls_blocks:
            fstart, fend, item = blk
            if fend <= fpos:
                continue
            if not isinstance(item, tuple):  # pending classify future
                item = _to_abs(item.result(), fstart)
                blk[2] = item
            pos, k = item
            if fstart < fpos:
                i = int(np.searchsorted(pos, fpos, side="left"))
                pos, k = pos[i:], k[i:]
            parts_p.append(pos)
            parts_k.append(k)
        if not parts_p:
            return _EMPTY
        pos = parts_p[0] if len(parts_p) == 1 else np.concatenate(parts_p)
        k = parts_k[0] if len(parts_k) == 1 else np.concatenate(parts_k)
        if pos.size == 0:
            return _EMPTY
        out_pos, kind = _select_candidates(pos, k)
        return out_pos - self._base, kind

    def _rel(self, fpos: int) -> int:
        return fpos - self._base

    # -- retrying scalar helpers (file-offset domain) -----------------------

    def _skip_ws(self, fpos: int, commas: bool = False) -> int:
        rx = _NON_WS_COMMA if commas else _NON_WS
        while True:
            m = rx.search(self._buf, self._rel(fpos))
            if m is not None:
                return self._base + m.start()
            if not self._fill():
                return EOB

    def _peek(self, fpos: int) -> int:
        while self._rel(fpos) >= len(self._buf):
            if not self._fill():
                raise MalformedMRFError("unexpected end of file")
        return self._buf[self._rel(fpos)]

    def _string_end(self, fpos: int) -> int:
        """fpos at opening quote -> file offset just after closing quote."""
        want = self._read_size
        while True:
            r = skip_string(self._buf, self._rel(fpos))
            if r != EOB:
                return self._base + r
            if not self._fill(want):
                raise MalformedMRFError("unterminated string")
            want *= 2

    def _value_end(self, fpos: int) -> int:
        """fpos at first byte of any JSON value -> file offset of its last
        byte. Used for (small) header values only."""
        c = self._peek(fpos)
        want = self._read_size
        while True:
            rel = self._rel(fpos)
            if c in (0x7B, 0x5B):
                r = seek_matching_end(self._buf, rel)
            elif c == 0x22:
                r = skip_string(self._buf, rel)
                if r != EOB:
                    r -= 1
            else:
                r = scalar_value_end(self._buf, rel)
            if r != EOB:
                return self._base + r
            if not self._fill(want):
                raise MalformedMRFError("unterminated value")
            want *= 2

    # -- main scan ----------------------------------------------------------

    def scan(self) -> Iterator[Chunk]:
        pos = self._skip_ws(0)
        if pos == EOB:
            return  # empty file -> no chunks
        if self._peek(pos) != 0x7B:
            raise MalformedMRFError("top-level value must be a JSON object")
        header_start = pos
        header_last_end = pos
        pos += 1
        while True:
            pos = self._skip_ws(pos, commas=True)
            if pos == EOB:
                raise MalformedMRFError("unterminated top-level object")
            c = self._peek(pos)
            if c == 0x7D:  # '}' — end of root object
                yield from self._flush_header(header_start, pos)
                self._pos = pos + 1
                return
            if c != 0x22:
                raise MalformedMRFError(
                    f"expected object key at byte {pos}, got {chr(c)!r}"
                )
            # split over-long header runs at value boundaries
            if pos - header_start >= self._target:
                yield from self._flush_header(header_start, header_last_end)
                header_start = pos
            key_start = pos
            after_key = self._string_end(pos)
            # decode with JSON string semantics — keys may contain escapes
            # (reference caps keys at 25 raw chars and skips unescaping,
            # ByteParser.scala:36; we decode properly)
            key = json.loads(
                bytes(
                    memoryview(self._buf)[
                        self._rel(pos) : self._rel(after_key)
                    ]
                )
            )
            colon = self._skip_ws(after_key)
            if colon == EOB or self._peek(colon) != 0x3A:
                raise MalformedMRFError(f"expected ':' after key {key!r}")
            vpos = self._skip_ws(colon + 1)
            if vpos == EOB:
                raise MalformedMRFError(f"missing value for key {key!r}")
            if self._peek(vpos) == 0x5B:  # '[' — a top-level array
                yield from self._flush_header(header_start, key_start - 1)
                yield from self._scan_array(vpos + 1, key)
                pos = self._pos
                header_start = pos
                header_last_end = pos
            else:
                pos = self._value_end(vpos) + 1
                header_last_end = pos - 1

    def _flush_header(self, start: int, end: int) -> Iterator[Chunk]:
        """Emit [start, end] as a header fragment if it contains at least one
        key (a quote); pure-syntax gaps (whitespace/commas/braces) are
        skipped."""
        if end < start:
            return
        # find with bounds, not a memoryview slice — a live export of _buf
        # would make the _drop resize raise BufferError
        if self._buf.find(b'"', self._rel(start), self._rel(end) + 1) < 0:
            return
        yield Chunk(start, end, "", 0)
        self._drop(end + 1)

    # -- array interior -----------------------------------------------------

    def _scan_array(self, fpos: int, key: str) -> Iterator[Chunk]:
        """fpos: file offset just after '['. Emits element-run chunks; on
        return ``self._pos`` is the file offset just after the closing ']'."""
        run_start: int | None = None
        run_end = -1
        run_n = 0
        want = self._read_size
        while True:
            # manifest keeps offsets only — bytes before fpos are never needed
            self._drop(fpos)
            rel = self._rel(fpos)
            if rel >= len(self._buf) and not self._fill(want):
                raise MalformedMRFError(f"unterminated array {key!r}")
            cpos, ckind = self._candidates(fpos)
            if cpos.size == 0:
                if not self._fill(want):
                    raise MalformedMRFError(f"unterminated array {key!r}")
                want *= 2
                continue
            want = self._read_size
            out, fpos, run_start, run_end, run_n, done = self._consume_window(
                fpos, rel, cpos, ckind, key, run_start, run_end, run_n
            )
            yield from out
            if done:
                return

    def _consume_composites(
        self, cur, cpos, ckind, key, run_start, run_end, run_n
    ):
        """Vectorized window consumption for the dominant MRF shape: an
        array of composite ({...}/[...]) elements. Preconditions (checked
        by the caller): candidates at/after ``cur`` strictly alternate
        close/comma starting with a close, and an array-close, if present,
        is the final candidate directly after an element close — which is
        exactly the candidate signature of composite-only elements (string
        or scalar elements leave comma-comma gaps and force the general
        per-element loop instead).

        All element ends are then known up front, so run assembly is a
        handful of searchsorted calls per emitted chunk instead of a
        Python iteration per element — discovery throughput is the bronze
        ingest bottleneck, and this path covers ~100% of real MRF bytes.
        Returns the same tuple as ``_consume_window``."""
        buf = self._buf
        base = self._base
        out: list[Chunk] = []
        start_i = int(np.searchsorted(cpos, cur, side="left"))
        k = ckind[start_i:]
        p = cpos[start_i:]
        has_arr_close = k[-1] == 2
        ends_abs = p[k == 1].astype(np.int64)
        ends_abs += base
        n_ends = ends_abs.size
        if run_start is None:
            run_start = base + cur
        i = 0
        while i < n_ends:
            j = int(
                np.searchsorted(
                    ends_abs, run_start + self._target - 1, side="left"
                )
            )
            if j >= n_ends:
                run_n += n_ends - i
                run_end = int(ends_abs[-1])
                i = n_ends
                break
            run_n += j - i + 1
            run_end = int(ends_abs[j])
            out.append(Chunk(run_start, run_end, key, run_n))
            i = j + 1
            run_n = 0
            if i < n_ends:
                m = _NON_WS_COMMA.search(buf, run_end + 1 - base)
                run_start = base + m.start()
            else:
                run_start, run_end = None, -1
        if has_arr_close:
            if run_start is not None and run_n > 0:
                out.append(Chunk(run_start, run_end, key, run_n))
            self._pos = base + int(p[-1]) + 1
            return out, self._pos, None, -1, 0, True
        fpos = int(ends_abs[-1]) + 1
        return out, fpos, run_start, run_end, run_n, False

    def _consume_window(
        self, fpos, rel, cpos, ckind, key, run_start, run_end, run_n
    ):
        """Walk the candidate list for the current buffer window. Returns
        (chunks, new_fpos, run_start, run_end, run_n, done)."""
        buf = self._buf
        base = self._base
        m0 = _NON_WS_COMMA.search(buf, fpos - base)
        if m0 is not None and buf[m0.start()] in (0x7B, 0x5B):
            cur0 = m0.start()
            si = int(np.searchsorted(cpos, cur0, side="left"))
            k = ckind[si:]
            if (
                k.size
                and k[0] == 1
                and not np.any(k[1:] == k[:-1])
                and (
                    (n2 := int(np.count_nonzero(k == 2))) == 0
                    or (
                        n2 == 1
                        and k[-1] == 2
                        and k.size >= 2
                        and k[-2] == 1
                    )
                )
            ):
                return self._consume_composites(
                    cur0, cpos, ckind, key, run_start, run_end, run_n
                )
        out: list[Chunk] = []
        n_cand = cpos.size
        ci = 0
        abs_limit = base + len(buf)
        while True:
            # position at next element start (skip ws and separators)
            m = _NON_WS_COMMA.search(buf, fpos - base)
            if m is None:
                return out, fpos, run_start, run_end, run_n, False
            cur = m.start()
            fpos = base + cur
            c = buf[cur]
            if c == 0x5D:  # ']' — array closed
                if run_start is not None:
                    out.append(Chunk(run_start, run_end, key, run_n))
                self._pos = fpos + 1
                return out, self._pos, None, -1, 0, True
            # advance candidate pointer past anything before cur
            while ci < n_cand and cpos[ci] < cur:
                ci += 1
            if c in (0x7B, 0x5B):  # composite element
                # its end is the next close candidate
                while ci < n_cand and ckind[ci] == 0:
                    ci += 1
                if ci >= n_cand:
                    return out, fpos, run_start, run_end, run_n, False
                if ckind[ci] == 2:
                    raise MalformedMRFError(
                        f"unbalanced element in array {key!r}"
                    )
                elem_end = base + int(cpos[ci])
                ci += 1
            elif c == 0x22:  # string element
                after = skip_string(buf, cur)
                if after == EOB:
                    return out, fpos, run_start, run_end, run_n, False
                elem_end = base + after - 1
            else:  # number/true/false/null element
                if ci >= n_cand:
                    return out, fpos, run_start, run_end, run_n, False
                if ckind[ci] == 1:
                    raise MalformedMRFError(f"malformed scalar in array {key!r}")
                sep = base + int(cpos[ci])
                e = sep - 1
                while e > fpos and buf[e - base] in _WS:
                    e -= 1
                elem_end = e
                if ckind[ci] == 2:
                    # scalar is the last element; let ']' be seen next loop
                    pass
                else:
                    ci += 1
                fpos = sep
                if run_start is None:
                    run_start = base + cur
                run_end = elem_end
                run_n += 1
                if run_end - run_start + 1 >= self._target:
                    out.append(Chunk(run_start, run_end, key, run_n))
                    run_start, run_end, run_n = None, -1, 0
                continue
            # composite/string element bookkeeping
            if run_start is None:
                run_start = base + cur
            run_end = elem_end
            run_n += 1
            fpos = elem_end + 1
            if run_end - run_start + 1 >= self._target:
                out.append(Chunk(run_start, run_end, key, run_n))
                run_start, run_end, run_n = None, -1, 0
            if fpos >= abs_limit:
                return out, fpos, run_start, run_end, run_n, False


def scan_chunks(
    path: str,
    chunk_target_bytes: int = DEFAULT_CHUNK_TARGET,
    read_size: int = DEFAULT_READ_SIZE,
    prefetch: bool | None = None,
) -> Iterator[Chunk]:
    """Scan a (local or remote) MRF file and yield its chunk manifest."""
    from hls_payer_mrf_sparkstreaming_spark.sources.io import open_input

    with open_input(path) as f:
        yield from ChunkScanner(
            f, chunk_target_bytes, read_size, prefetch=prefetch
        ).scan()


# ---------------------------------------------------------------------------
# Read-side (executor) helpers: byte range -> standalone parseable JSON.
# ---------------------------------------------------------------------------


def repair_header_fragment(raw: bytes) -> str:
    """Make a header fragment a standalone JSON object string.

    Strips separator syntax, then balances braces (string-aware), mirroring
    the reference's read-time repair (JsonChunks.scala:50-66) but robust to
    any fragment shape: leading root ``{``, trailing root ``}``, nested
    object values, or bare ``"k": v`` runs.
    """
    s = raw.strip(b" \t\r\n,")
    if not s:
        return "{}"
    depth = 0
    min_depth = 0
    pos = 0
    n = len(s)
    while pos < n:
        m = _STRUCTURAL.search(s, pos)
        if m is None:
            break
        j = m.start()
        c = s[j]
        if c == 0x22:
            nxt = skip_string(s, j)
            if nxt == EOB:
                break
            pos = nxt
        else:
            if c in (0x7B, 0x5B):
                depth += 1
            else:
                depth -= 1
                if depth < min_depth:
                    min_depth = depth
            pos = j + 1
    prefix = b"{" * (-min_depth)
    suffix = b"}" * (depth - min_depth)
    out = prefix + s + suffix
    if not out.startswith(b"{"):
        out = b"{" + out + b"}"
    return out.decode("utf-8")


def wrap_array_payload(raw: bytes) -> str:
    """Element-run bytes -> JSON array string (reference JsonChunks.scala:85-93)."""
    return (b"[" + raw.strip(b" \t\r\n,") + b"]").decode("utf-8")


def split_elements(raw: bytes) -> list[str]:
    """Element-run bytes -> list of individual element JSON strings
    (reference ``payloadAsArray`` mode, JsonChunks.scala:69-83)."""
    s = raw.strip(b" \t\r\n,")
    out: list[str] = []
    pos = 0
    n = len(s)
    while pos < n:
        m = _NON_WS_COMMA.search(s, pos)
        if m is None:
            break
        i = m.start()
        c = s[i]
        if c in (0x7B, 0x5B):
            e = seek_matching_end(s, i)
            if e == EOB:
                raise MalformedMRFError("incomplete element in chunk")
        elif c == 0x22:
            e = skip_string(s, i)
            if e == EOB:
                raise MalformedMRFError("unterminated string in chunk")
            e -= 1
        else:
            e = scalar_value_end(s, i)
            if e == EOB:  # last bare scalar runs to end of chunk
                e = n - 1
                while e > i and s[e] in _WS:
                    e -= 1
        out.append(s[i : e + 1].decode("utf-8"))
        pos = e + 1
    return out
