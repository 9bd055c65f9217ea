"""Foreign-encoder USDC crate tests (VERDICT r2 "What's missing" #2).

`assets/usdc.py`'s reader had only ever decoded crates produced by the
repo's own `CrateWriter` — a mirrored encoder/decoder bug would be
invisible. No third-party .usdc is obtainable in this environment (no
pxr wheel, zero egress, the Swift reference ships no USD assets), so
this module carries an INDEPENDENT crate encoder written against the
public crate layout notes, deliberately choosing every encoding the
repo writer never produces:

- real LZ4 match sequences (greedy matcher; the writer is literal-only)
- multi-chunk TfFastCompression framing (writer: single bare chunk)
- integer streams using delta codes 0/1/2 (commonValue, int8, int16;
  the writer emits only code-3 int32 deltas)
- inlined scalar / vec3f / matrix4d-diagonal / string / specifier reps
- a NON-inlined token rep (u32 token index on the heap)
- compressed int arrays and compressed float arrays, both the 'i'
  (integer-representable) and 't' (lookup-table) codes
- T_TOKEN_VECTOR arrays, a non-empty STRINGS section
- different file layout (section order shuffled, an unknown BOGUS
  section the reader must ignore) and a version-0.6 variant exercising
  the uint32 array-count branch

Mirrors the reference's real-asset ingestion obligation
(/root/reference/MetalRaytracing/Model.swift:63-70, ModelIO USDZ load).
"""

import struct
import zipfile
from collections import Counter

import numpy as np
import pytest

from mrt_tpu.assets import usdc as U
from mrt_tpu.assets.usd import _load_layer_bytes, load_usd


# ---------------------------------------------------------------------------
# independent encoders (no code shared with usdc.CrateWriter)
# ---------------------------------------------------------------------------

def _lz4_compress(src: bytes) -> bytes:
    """Greedy LZ4 block encoder that emits REAL match sequences."""
    out = bytearray()
    n = len(src)

    def seq(lit_bytes: bytes, mlen: int, off: int):
        lit = len(lit_bytes)
        tok_l = 15 if lit >= 15 else lit
        tok_m = 0 if mlen == 0 else (15 if mlen - 4 >= 15 else mlen - 4)
        out.append((tok_l << 4) | tok_m)
        if lit >= 15:
            r = lit - 15
            while r >= 255:
                out.append(255)
                r -= 255
            out.append(r)
        out.extend(lit_bytes)
        if mlen == 0:
            return
        out.append(off & 0xFF)
        out.append(off >> 8)
        if mlen - 4 >= 15:
            r = mlen - 4 - 15
            while r >= 255:
                out.append(255)
                r -= 255
            out.append(r)

    table: dict = {}
    i = anchor = 0
    while i < n:
        key = src[i : i + 4]
        cand = table.get(key, -1) if len(key) == 4 else -1
        if cand >= 0 and i - cand <= 65535:
            mlen = 4
            while i + mlen < n and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            # keep the tail as literals (LZ4 end-of-block convention)
            if i + mlen > n - 5:
                mlen = (n - 5) - i
            if mlen >= 4:
                seq(src[anchor:i], mlen, i - cand)
                for k in range(i, min(i + mlen, n - 3)):
                    table[src[k : k + 4]] = k
                i += mlen
                anchor = i
                continue
        if len(key) == 4:
            table[key] = i
        i += 1
    seq(src[anchor:], 0, 0)
    return bytes(out)


def _tf_compress(raw: bytes) -> bytes:
    """Multi-chunk TfFastCompression framing when the payload allows."""
    if len(raw) < 32:
        return bytes([0]) + _lz4_compress(raw)
    h = len(raw) // 2
    out = bytearray([2])
    for chunk in (raw[:h], raw[h:]):
        c = _lz4_compress(chunk)
        out += struct.pack("<i", len(c)) + c
    return bytes(out)


def _encode_ints(vals) -> bytes:
    """Usd_IntegerCompression stream using ALL FOUR delta codes."""
    vals = [int(v) for v in vals]
    deltas, prev = [], 0
    for v in vals:
        deltas.append(v - prev)
        prev = v
    common = Counter(deltas).most_common(1)[0][0] if deltas else 0
    if not (-(2**31) <= common < 2**31):
        common = 0
    codes = bytearray((len(vals) * 2 + 7) // 8)
    payload = bytearray()
    for i, d in enumerate(deltas):
        if d == common:
            c = 0
        elif -128 <= d < 128:
            c = 1
            payload += struct.pack("<b", d)
        elif -32768 <= d < 32768:
            c = 2
            payload += struct.pack("<h", d)
        else:
            c = 3
            payload += struct.pack("<i", d)
        codes[i >> 2] |= c << ((i & 3) * 2)
    return struct.pack("<i", common) + bytes(codes) + bytes(payload)


def _comp_ints(vals) -> bytes:
    c = _tf_compress(_encode_ints(vals))
    return struct.pack("<Q", len(c)) + c


_HEADER = 88


class ForeignCrate:
    """Hand-rolled crate assembler: heap-after-header, shuffled section
    order, an unknown section, absolute heap offsets written directly."""

    def __init__(self, version=(0, 8, 0)):
        self.version = version
        self.tokens = [""]  # index 0 reserved so prop tokens negate cleanly
        self._tok = {"": 0}
        self.strings: list = []
        self.heap = bytearray()
        self.fields: list = []
        self._fieldkey: dict = {}
        self.fieldsets: list = []
        self.specs: list = []  # (path string, flat fieldset start, spec type)
        self.paths: list = []
        self._pidx: dict = {}

    # -- primitives --------------------------------------------------------
    def tok(self, s: str) -> int:
        if s not in self._tok:
            self._tok[s] = len(self.tokens)
            self.tokens.append(s)
        return self._tok[s]

    def pidx(self, p: str) -> int:
        if p not in self._pidx:
            self._pidx[p] = len(self.paths)
            self.paths.append(p)
        return self._pidx[p]

    def blob(self, raw: bytes) -> int:
        off = _HEADER + len(self.heap)
        self.heap += raw
        return off

    def _count(self, n: int) -> bytes:
        return struct.pack("<Q", n) if self.version >= (0, 7, 0) else struct.pack("<I", n)

    # -- value reps ----------------------------------------------------------
    def rep_tok_inline(self, s: str) -> int:
        return (U.T_TOKEN << 48) | U._INLINED_BIT | self.tok(s)

    def rep_tok_heap(self, s: str) -> int:
        return (U.T_TOKEN << 48) | self.blob(struct.pack("<I", self.tok(s)))

    def rep_str_inline(self, s: str) -> int:
        self.strings.append(self.tok(s))
        return (U.T_STRING << 48) | U._INLINED_BIT | (len(self.strings) - 1)

    def rep_specifier(self, which: int) -> int:
        return (U.T_SPECIFIER << 48) | which

    def rep_int_inline(self, v: int) -> int:
        return (U.T_INT << 48) | U._INLINED_BIT | (v & 0xFFFFFFFF)

    def rep_double_inline(self, v: int) -> int:
        return (U.T_DOUBLE << 48) | U._INLINED_BIT | (v & 0xFFFFFFFF)

    def rep_vec3f_inline(self, comps) -> int:
        payload = int.from_bytes(np.asarray(comps, np.int8).tobytes() + b"\0", "little")
        return (U.T_VEC3F << 48) | U._INLINED_BIT | payload

    def rep_mat4_diag_inline(self, diag) -> int:
        payload = int.from_bytes(np.asarray(diag, np.int8).tobytes(), "little")
        return (U.T_MATRIX4D << 48) | U._INLINED_BIT | payload

    def rep_array_raw(self, ty: int, arr) -> int:
        dt, width = U._VEC_INFO[ty]
        a = np.asarray(arr, dt)
        cnt = a.shape[0]
        return (ty << 48) | U._ARRAY_BIT | self.blob(self._count(cnt) + a.tobytes())

    def rep_int_array_compressed(self, vals) -> int:
        vals = list(vals)
        raw = self._count(len(vals)) + _comp_ints(vals)
        return (U.T_INT << 48) | U._ARRAY_BIT | U._COMPRESSED_BIT | self.blob(raw)

    def rep_float_array_i(self, ty: int, int_vals) -> int:
        """compressed float array, code 'i': integer-representable values."""
        dt, width = U._VEC_INFO[ty]
        flat = np.asarray(int_vals).reshape(-1)
        cnt = len(flat) // width
        raw = self._count(cnt) + b"i" + _comp_ints(flat.tolist())
        return (ty << 48) | U._ARRAY_BIT | U._COMPRESSED_BIT | self.blob(raw)

    def rep_float_array_t(self, ty: int, lut, idx) -> int:
        """compressed float array, code 't': lookup table + index stream."""
        dt, width = U._VEC_INFO[ty]
        lut = np.asarray(lut, dt)
        idx = list(idx)
        cnt = len(idx) // width
        raw = (self._count(cnt) + b"t" + struct.pack("<I", len(lut))
               + lut.tobytes() + _comp_ints(idx))
        return (ty << 48) | U._ARRAY_BIT | U._COMPRESSED_BIT | self.blob(raw)

    def rep_token_vector(self, toks) -> int:
        idx = [self.tok(t) for t in toks]
        raw = struct.pack("<Q", len(idx)) + struct.pack(f"<{len(idx)}I", *idx)
        return (U.T_TOKEN_VECTOR << 48) | U._ARRAY_BIT | self.blob(raw)

    def rep_time_samples(self, times_rep: int, value_reps) -> int:
        raw = struct.pack("<Q", times_rep) + struct.pack("<Q", len(value_reps))
        raw += struct.pack(f"<{len(value_reps)}Q", *value_reps)
        return (U.T_TIME_SAMPLES << 48) | self.blob(raw)

    # -- specs ---------------------------------------------------------------
    def _field(self, name: str, rep: int) -> int:
        key = (name, rep)
        if key not in self._fieldkey:
            self._fieldkey[key] = len(self.fields)
            self.fields.append((self.tok(name), rep))
        return self._fieldkey[key]

    def spec(self, path: str, spec_type: int, fields: dict):
        start = len(self.fieldsets)
        for name, rep in fields.items():
            self.fieldsets.append(self._field(name, rep))
        self.fieldsets.append(-1)  # terminator (uint32 0xFFFFFFFF)
        self.pidx(path if path != "/" else "/")
        self.specs.append((path, start, spec_type))

    # -- path tree -----------------------------------------------------------
    def _entries(self):
        children: dict = {}
        for p in sorted(self._pidx):
            if p == "/":
                continue
            tail = p.rsplit("/", 1)[-1]
            if "." in tail:
                parent, _, elem = p.rpartition(".")
                is_prop = True
            else:
                parent, _, elem = p.rpartition("/")
                parent = parent or "/"
                is_prop = False
            children.setdefault(parent, []).append((elem, p, is_prop))
        self.pidx("/")
        entries: list = []

        def walk(path_str: str, elem_tok: int) -> int:
            my = len(entries)
            entries.append([self._pidx[path_str], elem_tok, -2])
            kids = children.get(path_str, [])
            heads = [walk(cp, -self.tok(e) if prop else self.tok(e))
                     for e, cp, prop in kids]
            for k, h in enumerate(heads):
                has_child = bool(children.get(kids[k][1]))
                if k == len(heads) - 1:
                    entries[h][2] = -1 if has_child else -2
                else:
                    entries[h][2] = (heads[k + 1] - h) if has_child else 0
            return my

        walk("/", 0)
        entries[0][2] = -1 if children.get("/") else -2
        return entries

    # -- assembly --------------------------------------------------------------
    def tobytes(self) -> bytes:
        entries = self._entries()
        out = bytearray(b"PXR-USDC")
        out += bytes(self.version) + b"\0\0\0\0\0"
        out += b"\0" * 72
        assert len(out) == _HEADER
        out += self.heap

        sections = {}

        def sec(name: str, payload: bytes):
            sections[name] = (len(out), len(payload))
            out.extend(payload)

        # deliberately NOT the writer's order; BOGUS must be ignored
        sec("BOGUS", b"\xde\xad\xbe\xef")
        sec("SPECS",
            struct.pack("<Q", len(self.specs))
            + _comp_ints([self._pidx[p] for p, _, _ in self.specs])
            + _comp_ints([s for _, s, _ in self.specs])
            + _comp_ints([t for _, _, t in self.specs]))
        sec("PATHS",
            struct.pack("<Q", len(self.paths))
            + struct.pack("<Q", len(entries))
            + _comp_ints([e[0] for e in entries])
            + _comp_ints([e[1] for e in entries])
            + _comp_ints([e[2] for e in entries]))
        sec("FIELDSETS",
            struct.pack("<Q", len(self.fieldsets)) + _comp_ints(self.fieldsets))
        reps_raw = np.asarray([r for _, r in self.fields], "<u8").tobytes()
        reps_c = _tf_compress(reps_raw)
        sec("FIELDS",
            struct.pack("<Q", len(self.fields))
            + _comp_ints([t for t, _ in self.fields])
            + struct.pack("<Q", len(reps_c)) + reps_c)
        sec("STRINGS",
            struct.pack("<Q", len(self.strings))
            + (struct.pack(f"<{len(self.strings)}I", *self.strings)
               if self.strings else b""))
        tok_blob = b"\0".join(t.encode() for t in self.tokens) + b"\0"
        tok_c = _tf_compress(tok_blob)
        sec("TOKENS",
            struct.pack("<QQQ", len(self.tokens), len(tok_blob), len(tok_c))
            + tok_c)

        toc_off = len(out)
        out += struct.pack("<Q", len(sections))
        for name, (start, size) in sections.items():
            out += name.encode().ljust(16, b"\0") + struct.pack("<QQ", start, size)
        struct.pack_into("<Q", out, 16, toc_off)
        return bytes(out)


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------

_POINTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
_ST = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)


def build_foreign_quad(version=(0, 8, 0)) -> bytes:
    c = ForeignCrate(version)
    c.spec("/", U.SPEC_PSEUDO_ROOT, {
        "upAxis": c.rep_tok_inline("Y"),
        "metersPerUnit": c.rep_double_inline(1),
        "comment": c.rep_str_inline("foreign-encoder fixture"),
    })
    c.spec("/Root", U.SPEC_PRIM, {
        "typeName": c.rep_tok_inline("Xform"),
        "specifier": c.rep_specifier(0),
    })
    c.spec("/Root/Quad", U.SPEC_PRIM, {
        "typeName": c.rep_tok_heap("Mesh"),  # NON-inlined token
        "specifier": c.rep_specifier(0),
    })
    if version >= (0, 7, 0):
        points_rep = c.rep_float_array_t(
            U.T_VEC3F, [0.0, 1.0], _POINTS.reshape(-1).astype(int).tolist())
        fvi_rep = c.rep_int_array_compressed([0, 1, 2, 3])
        fvc_rep = c.rep_int_array_compressed([4])
        st_rep = c.rep_float_array_i(
            U.T_VEC2F, _ST.reshape(-1).astype(int).tolist())
    else:  # v0.6: raw arrays with uint32 counts
        points_rep = c.rep_array_raw(U.T_VEC3F, _POINTS)
        fvi_rep = c.rep_array_raw(U.T_INT, np.array([0, 1, 2, 3], np.int32))
        fvc_rep = c.rep_array_raw(U.T_INT, np.array([4], np.int32))
        st_rep = c.rep_array_raw(U.T_VEC2F, _ST)
    c.spec("/Root/Quad.points", U.SPEC_ATTRIBUTE, {"default": points_rep})
    c.spec("/Root/Quad.faceVertexIndices", U.SPEC_ATTRIBUTE, {"default": fvi_rep})
    c.spec("/Root/Quad.faceVertexCounts", U.SPEC_ATTRIBUTE, {"default": fvc_rep})
    c.spec("/Root/Quad.normals", U.SPEC_ATTRIBUTE, {
        "default": c.rep_array_raw(U.T_VEC3F, np.tile([0, 0, 1], (4, 1)))})
    c.spec("/Root/Quad.primvars:st", U.SPEC_ATTRIBUTE, {"default": st_rep})
    c.spec("/Root/Quad.primvars:displayColor", U.SPEC_ATTRIBUTE, {
        "default": c.rep_array_raw(U.T_VEC3F, np.array([[0.25, 0.5, 0.75]]))})
    if version >= (0, 7, 0):
        c.spec("/Root/Quad.testInlineVec", U.SPEC_ATTRIBUTE, {
            "default": c.rep_vec3f_inline([1, -2, 3])})
        c.spec("/Root/Quad.testInlineInt", U.SPEC_ATTRIBUTE, {
            "default": c.rep_int_inline(42)})
        c.spec("/Root/Quad.testMat", U.SPEC_ATTRIBUTE, {
            "default": c.rep_mat4_diag_inline([1, 2, 3, 4])})
        c.spec("/Root/Quad.testTokens", U.SPEC_ATTRIBUTE, {
            "default": c.rep_token_vector(["alpha", "beta"])})
        times_rep = c.rep_float_array_i(U.T_DOUBLE, [0, 1])
        v0 = c.rep_array_raw(U.T_VEC3F, _POINTS)
        v1 = c.rep_array_raw(U.T_VEC3F, _POINTS + np.float32(1.0))
        c.spec("/Root/Quad.testAnim", U.SPEC_ATTRIBUTE, {
            "timeSamples": c.rep_time_samples(times_rep, [v0, v1])})
        c.spec("/Root/Quad.material:binding", U.SPEC_RELATIONSHIP, {
            "targetPaths": c.rep_tok_heap("/Materials/Red")})
    return c.tobytes()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_foreign_lz4_roundtrips_with_real_matches():
    raw = (b"abcdabcdabcdabcd-the-quick-brown-fox-" * 9) + b"tail-literals"
    comp = _lz4_compress(raw)
    # literal-only encoding would be >= len(raw); a shorter stream proves
    # real match sequences were emitted (the decoder's overlap-copy path)
    assert len(comp) < len(raw)
    assert U.lz4_block_decompress(comp, len(raw)) == raw


def test_foreign_integer_stream_uses_all_codes():
    vals = [0, 1, 2, 3, 4, 500, 400, 100000, 99999, 99998]
    raw = _encode_ints(vals)
    got = U.decode_integers(raw, len(vals))
    assert got.tolist() == vals
    # multi-chunk framing too
    big = bytes(range(256)) * 8
    assert U.tf_decompress(_tf_compress(big), len(big)) == big


def test_foreign_crate_decodes_mesh_and_every_rep_kind():
    data = build_foreign_quad()
    root, meta = U.read_crate_prims(data)
    assert meta["upAxis"] == "Y"
    assert meta["metersPerUnit"] == 1
    assert meta["comment"] == "foreign-encoder fixture"

    meshes = root.find("Mesh")
    assert len(meshes) == 1
    q = meshes[0]
    assert q.path == "/Root/Quad"
    np.testing.assert_array_equal(np.asarray(q.attrs["points"]), _POINTS)
    assert list(q.attrs["faceVertexIndices"]) == [0, 1, 2, 3]
    assert list(q.attrs["faceVertexCounts"]) == [4]
    np.testing.assert_array_equal(np.asarray(q.attrs["primvars:st"]), _ST)
    np.testing.assert_allclose(
        np.asarray(q.attrs["primvars:displayColor"]), [[0.25, 0.5, 0.75]])
    np.testing.assert_array_equal(q.attrs["testInlineVec"], [1, -2, 3])
    assert q.attrs["testInlineInt"] == 42
    np.testing.assert_array_equal(q.attrs["testMat"], np.diag([1.0, 2, 3, 4]))
    assert q.attrs["testTokens"] == ["alpha", "beta"]
    ts = q.time_samples["testAnim"]
    assert sorted(ts) == [0.0, 1.0]
    np.testing.assert_array_equal(ts[0.0], _POINTS)
    np.testing.assert_array_equal(ts[1.0], _POINTS + 1.0)
    assert q.rels["material:binding"] == "/Materials/Red"


def test_foreign_crate_through_scene_extraction(tmp_path):
    mesh, skin = _load_layer_bytes(build_foreign_quad())
    assert skin is None
    np.testing.assert_array_equal(mesh.positions, _POINTS)
    np.testing.assert_array_equal(
        mesh.submeshes[0].indices, [[0, 1, 2], [0, 2, 3]])
    assert mesh.submeshes[0].material.base_color == (0.25, 0.5, 0.75)
    # and through the .usdz container path (Model.swift:63-70 analog)
    zp = tmp_path / "foreign.usdz"
    with zipfile.ZipFile(zp, "w", zipfile.ZIP_STORED) as z:
        z.writestr("foreign.usdc", build_foreign_quad())
    mesh2, _ = load_usd(zp)
    np.testing.assert_array_equal(mesh2.positions, _POINTS)


def test_foreign_crate_v06_uint32_counts():
    mesh, _ = _load_layer_bytes(build_foreign_quad(version=(0, 6, 0)))
    np.testing.assert_array_equal(mesh.positions, _POINTS)
    np.testing.assert_array_equal(
        mesh.submeshes[0].indices, [[0, 1, 2], [0, 2, 3]])


def test_corrupt_crates_fail_loudly():
    good = build_foreign_quad()
    with pytest.raises(ValueError, match="not a usdc crate"):
        U.CrateFile(b"NOT-USDC" + good[8:])
    # truncations at various depths must raise, never hang or return junk
    for cut in (20, 90, len(good) // 2, len(good) - 8):
        with pytest.raises(Exception):
            U.read_crate_prims(good[:cut])
    # unknown float-compression code byte
    marker = build_foreign_quad()
    i = marker.find(b"t", _HEADER)  # first 't' code byte lives in the heap
    assert 0 < i < len(marker)
    bad = marker[:i] + b"x" + marker[i + 1 :]
    with pytest.raises(ValueError, match="float-compression"):
        U.read_crate_prims(bad)
    # zero-offset LZ4 match is corrupt
    with pytest.raises(ValueError, match="zero offset"):
        U.lz4_block_decompress(b"\x10a\x00\x00", 16)
