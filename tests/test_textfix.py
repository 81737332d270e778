"""Encoding-repair fixer (functions/textfix.py — the reference's ftfy seam,
utils/ftfy_utils.py:5-8, implemented natively with an adapter registry)."""

import pyarrow as pa
import pytest
from hypothesis import given
from hypothesis import strategies as st

from text_dedup_ray.functions.textfix import (
    fix_mojibake,
    fix_text_array,
    fix_text_native,
    get_text_fixer,
    register_text_fixer,
)


def _sloppy_decode(b: bytes) -> str:
    # what real-world sloppy cp1252 decoders emit: cp1252 where mapped,
    # the raw latin-1 codepoint for the 5 unmapped bytes
    out = []
    for x in b:
        try:
            out.append(bytes([x]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(x))
    return "".join(out)


def mojibake(s: str, rounds: int = 1) -> str:
    for _ in range(rounds):
        s = _sloppy_decode(s.encode("utf-8"))
    return s


class TestNativeFixer:
    def test_single_mojibake(self):
        assert fix_text_native(mojibake("Café con leche")) == "Café con leche"

    def test_double_mojibake(self):
        assert fix_text_native(mojibake("é", 2)) == "é"

    def test_sloppy_cp1252_bytes(self):
        # '’' (U+2019) is E2 80 99 in UTF-8; cp1252 maps 0x99 -> '™' fine,
        # but 0x9D (in '“”' sequences) is one of the 5 unmapped bytes that
        # only the sloppy fallback recovers
        assert fix_text_native(mojibake("it’s")) == "it’s"
        assert fix_text_native(mojibake("“x”")) == "“x”"

    def test_legit_non_ascii_untouched(self):
        # a lone 'é' re-encodes to the invalid-UTF-8 byte E9: repair must
        # reject it and keep the text as-is
        assert fix_text_native("café résumé") == "café résumé"
        assert fix_text_native("naïve Führer") == "naïve Führer"

    def test_mixed_line_not_corrupted(self):
        # one line mojibake, one line legit: per-line repair fixes the
        # first without touching the second
        s = mojibake("Café") + "\n" + "résumé"
        assert fix_text_native(s) == "Café\nrésumé"

    def test_entities(self):
        assert fix_text_native("a &quot;b&quot; &amp; c") == 'a "b" & c'
        assert fix_text_native("caf&eacute;") == "café"
        assert fix_text_native("x &#233; &#x2019; y") == "x é ’ y"
        # bare ampersand is not an entity
        assert fix_text_native("AT&T r&d") == "AT&T r&d"
        # semicolon-less legacy entities never rewrite, even when a real
        # entity elsewhere trips the unescape stage (html.unescape applied
        # wholesale would turn "AT&ampx" into "AT&x" here; ftfy does not)
        assert fix_text_native("x &quot; and AT&ampx") == 'x " and AT&ampx'

    def test_line_breaks_and_controls(self):
        assert fix_text_native("a\r\nb\rc") == "a\nb\nc"
        assert fix_text_native("a\x01b\x7fc\x9dd\tz") == "abcd\tz"

    def test_nfc(self):
        decomposed = "ú"  # u + combining acute
        assert fix_text_native(decomposed) == "ú"

    @given(st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E)))
    def test_printable_ascii_fixed_point(self, s):
        # the fast-path claim in fix_text_array: printable ASCII without
        # entities is a fixed point ('&name;' substrings are the exception)
        import re

        if not re.search(r"&(?:#\d+|#[xX][0-9a-fA-F]+|[A-Za-z][A-Za-z0-9]{1,30});", s):
            assert fix_text_native(s) == s


class TestMojibakeRepair:
    def test_repair_requires_shrink(self):
        # cp1252-encodable text whose UTF-8 re-decode is itself: unchanged
        assert fix_mojibake("plain") == "plain"

    def test_no_repair_above_latin1(self):
        assert fix_mojibake("日本語") == "日本語"


class TestArrayKernel:
    def test_masked_repair_and_nulls(self):
        arr = pa.chunked_array(
            [pa.array(["plain", None, mojibake("Café") + " &amp; x", "ok\r\n"])]
        )
        assert fix_text_array(arr).to_pylist() == [
            "plain",
            None,
            "Café & x",
            "ok\n",
        ]

    def test_all_clean_is_identity_object(self):
        arr = pa.array(["abc", "def gh", ""])
        assert fix_text_array(arr) is arr

    def test_pinned_native_ignores_registered_adapter(self):
        # gate queries pin fixer="native" so a registered adapter (e.g. an
        # installed ftfy wheel) can never shift oracle-checked output
        register_text_fixer("shouty", str.upper)
        try:
            arr = pa.array(["a\rb", "clean"])
            assert fix_text_array(arr, fixer="native").to_pylist() == [
                "a\nb",
                "clean",
            ]
            # a custom adapter has NO fixed-point guarantee on clean ASCII,
            # so it must be applied to EVERY row (no fast-path bypass)
            assert fix_text_array(arr, fixer="shouty").to_pylist() == [
                "A\rB",
                "CLEAN",
            ]
        finally:
            from text_dedup_ray.functions import textfix

            textfix._TEXT_FIXERS.pop("shouty", None)

    def test_masked_transform_stitching(self):
        from text_dedup_ray.functions.textfix import masked_transform

        # interleaved clean/dirty runs, nulls, dirty at both ends
        col = pa.chunked_array(
            [pa.array(["X1", "aa", None, "X2", "bb", "X3"])]
        )
        out = masked_transform(
            col, r"^[a-z]*$", lambda s: s.lower(), vector_fn=None
        )
        assert out.to_pylist() == ["x1", "aa", None, "x2", "bb", "x3"]
        # with a vector_fn, clean rows take the vectorized result and dirty
        # rows the scalar path
        import pyarrow.compute as pc

        out2 = masked_transform(
            col,
            r"^[a-z]*$",
            lambda s: "D:" + s,
            vector_fn=lambda c: pc.utf8_upper(c),
        )
        assert out2.to_pylist() == ["D:X1", "AA", None, "D:X2", "BB", "D:X3"]

    def test_unknown_fixer_raises(self):
        with pytest.raises(KeyError):
            get_text_fixer("nope")


class TestFtfyParity:
    def test_ftfy_adapter_matches_native_on_core_vectors(self):
        ftfy = pytest.importorskip("ftfy")  # wheel absent in this sandbox
        for s in [mojibake("Café"), mojibake("it’s"), "a &amp; b", "x\r\ny"]:
            assert ftfy.fix_text(s) == fix_text_native(s)


class TestCcnetVectorParity:
    """The Arrow ccnet-normalize fast path must equal the reference Python
    kernel on every ASCII string (the fast path's eligibility set)."""

    @given(
        st.lists(
            st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x7F)),
            max_size=20,
        )
    )
    def test_ascii_parity(self, strings):
        from text_dedup_ray.functions.preprocess import normalize
        from text_dedup_ray.pipelines.textops import _ccnet_normalize_vector

        got = _ccnet_normalize_vector(pa.array(strings, pa.string())).to_pylist()
        assert got == [normalize(s) for s in strings]

    def test_mixed_batch_routes_non_ascii_to_python_kernel(self, ray_session):
        import ray

        from text_dedup_ray.functions.preprocess import normalize
        from text_dedup_ray.pipelines.textops import with_normalized

        texts = ["  Hello, W0rld 42! ", "Déjà vu — naïve", "日本語 123", "plain"]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
        )
        out = {r["doc_id"]: r["text_norm"] for r in with_normalized(ds).take_all()}
        assert out == {i: normalize(t) for i, t in enumerate(texts)}


class TestPipelineStage:
    def test_with_fixed_text(self, ray_session):
        import ray

        from text_dedup_ray.pipelines.textops import with_fixed_text

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["clean text", mojibake("Café"), "a&quot;b"]),
                }
            )
        )
        out = with_fixed_text(ds).take_all()
        assert [r["text_fixed"] for r in out] == ["clean text", "Café", 'a"b']
