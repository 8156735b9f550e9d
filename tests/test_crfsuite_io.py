"""Binary .crfsuite (lCRF/FOMC v100) interop tests.

Layout per the reference: header crf1d_model.c:43-75, FEAT records
crf1d_model.c:925-939, CQDB chunks src/cqdb/src/cqdb.c, featurerefs
crf1d_model.c (LFRF/AFRF). The strongest check compiles the
REFERENCE'S OWN reader (crf1d_model.c + cqdb.c + lookup3.c, unmodified,
straight from /root/reference) and asserts it reads our Python-written
file bit-exactly — gated on gcc availability.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from crfsuite_spark.train.crfsuite_io import (
    hashlittle,
    read_cqdb,
    read_model,
    write_cqdb,
    write_model,
)
from crfsuite_spark.train.model import CRFModel

REF = "/root/reference/src"


def _model(seed=3, A=42, L=3):
    rng = np.random.default_rng(seed)
    labels = ["B-ORG", "I-ORG", "O"][:L]
    attrs = [f"token[t]=w{i}" for i in range(A - 2)] + ["pos[t]=Ñoun", "orphan=zero"]
    sw = np.round(rng.normal(size=(A, L)), 6)
    sw[sw < -0.5] = 0.0
    sw[A - 1, :] = 0.0  # fully orphaned attribute -> pruned at write
    tw = np.round(rng.normal(size=(L, L)), 6)
    tw[0, L - 1] = 0.0
    return CRFModel(labels=labels, attrs=attrs, state_w=sw, trans_w=tw)


def test_hashlittle_reference_values():
    # lookup3's documented empty-string behavior: initial value returned
    # unmixed ("zero length strings require no mixing")
    assert hashlittle(b"") == 0xDEADBEEF
    assert hashlittle(b"", 0x2A) == (0xDEADBEEF + 0x2A) & 0xFFFFFFFF
    # deterministic, 32-bit, sensitive to every byte incl. the NUL the
    # CQDB writer appends
    assert hashlittle(b"abc\x00") != hashlittle(b"abc")
    assert 0 <= hashlittle(b"x" * 1000) <= 0xFFFFFFFF


def test_cqdb_roundtrip_with_gaps_and_unicode():
    pairs = [(f"attr=wörd{i}", i) for i in range(100)]
    pairs.append(("sparse-id", 500))  # gap: ids 100..499 unassigned
    buf = write_cqdb(pairs)
    back = read_cqdb(buf, 0)
    assert len(back) == 501
    for s, i in pairs:
        assert back[i] == s
    assert back[250] is None  # unassigned id


def test_model_roundtrip_binary():
    m = _model()
    path = "/tmp/test_model_roundtrip.crfsuite"
    m.to_crfsuite(path)
    m2 = CRFModel.from_crfsuite(path)
    assert m2.labels == m.labels
    # orphaned attribute pruned; survivors keep relative order
    kept = [a for i, a in enumerate(m.attrs) if (m.state_w[i] != 0).any()]
    assert m2.attrs == kept
    s1, t1 = m.coefficients()
    s2, t2 = m2.coefficients()
    assert {(r.attribute, r.label, r.weight) for r in s1.itertuples()} == \
           {(r.attribute, r.label, r.weight) for r in s2.itertuples()}
    assert {(r.from_label, r.to_label, r.weight) for r in t1.itertuples()} == \
           {(r.from_label, r.to_label, r.weight) for r in t2.itertuples()}
    os.remove(path)


def test_reader_on_byte_crafted_fixture(tmp_path):
    """Reader against a minimal file crafted field-by-field from the
    documented format — independent of our writer."""
    labels, attrs = ["A", "B"], ["f=x"]
    feats = [(0, 0, 1, 2.5), (1, 1, 0, -1.25)]  # state f=x->B, trans B->A
    out = bytearray(b"\x00" * 48)
    off_features = len(out)
    out += b"FEAT" + struct.pack("<II", 12 + 20 * len(feats), len(feats))
    for t, s, d, w in feats:
        out += struct.pack("<III", t, s, d) + struct.pack("<d", w)
    off_labels = len(out)
    out += write_cqdb([(s, i) for i, s in enumerate(labels)])
    off_attrs = len(out)
    out += write_cqdb([(s, i) for i, s in enumerate(attrs)])
    # refs omitted (offsets point past EOF is invalid — write empty ones)
    off_lrefs = len(out)
    out += b"LFRF" + struct.pack("<II", 12 + 4 * 4, 4) + b"\x00" * 16
    off_arefs = len(out)
    out += b"AFRF" + struct.pack("<II", 12 + 4, 1) + b"\x00" * 4
    header = b"lCRF" + struct.pack("<I", len(out)) + b"FOMC"
    header += struct.pack("<IIIIIIIII", 100, len(feats), 2, 1, off_features,
                          off_labels, off_attrs, off_lrefs, off_arefs)
    out[0:48] = header
    p = tmp_path / "crafted.crfsuite"
    p.write_bytes(bytes(out))
    rl, ra, sw, tw = read_model(str(p))
    assert rl == labels and ra == attrs
    assert sw.shape == (1, 2) and sw[0, 1] == 2.5 and sw[0, 0] == 0.0
    assert tw[1, 0] == -1.25


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"NOPE" + b"\x00" * 60)
    with pytest.raises(ValueError, match="magic"):
        read_model(str(p))
    m = _model()
    good = tmp_path / "good.crfsuite"
    m.to_crfsuite(str(good))
    buf = bytearray(good.read_bytes())
    buf[8:12] = b"XXXX"  # wrong model type
    bad_type = tmp_path / "badtype.crfsuite"
    bad_type.write_bytes(bytes(buf))
    with pytest.raises(ValueError, match="type"):
        read_model(str(bad_type))


_C_DRIVER = r"""
#include <stdio.h>
#include <stdlib.h>
#include <crfsuite.h>
#include "crf1d.h"
int main(int argc, char** argv) {
    crf1dm_t* m = crf1dm_new(argv[1]);
    if (!m) { printf("FAIL open\n"); return 1; }
    int L = crf1dm_get_num_labels(m), A = crf1dm_get_num_attrs(m);
    for (int i = 0; i < L; i++) printf("label %d %s\n", i, crf1dm_to_label(m, i));
    for (int a = 0; a < A; a++) {
        const char* s = crf1dm_to_attr(m, a);
        printf("attr %d %s roundtrip=%d\n", a, s, crf1dm_to_aid(m, s));
    }
    for (int a = 0; a < A; a++) {
        feature_refs_t r; crf1dm_get_attrref(m, a, &r);
        for (int j = 0; j < r.num_features; j++) {
            crf1dm_feature_t f;
            crf1dm_get_feature(m, crf1dm_get_featureid(&r, j), &f);
            printf("state %d %d %.17g\n", f.src, f.dst, f.weight);
        }
    }
    for (int l = 0; l < L; l++) {
        feature_refs_t r; crf1dm_get_labelref(m, l, &r);
        for (int j = 0; j < r.num_features; j++) {
            crf1dm_feature_t f;
            crf1dm_get_feature(m, crf1dm_get_featureid(&r, j), &f);
            printf("trans %d %d %.17g\n", f.src, f.dst, f.weight);
        }
    }
    crf1dm_close(m);
    return 0;
}
"""

# crfsuite.h includes R headers only for the R bridge; the reader code
# paths never call the R API, so empty-ish stubs satisfy the compiler
_R_STUB = (
    "typedef void* SEXP;\n"
    "#define PROTECT(x) (x)\n#define UNPROTECT(x)\n"
    "#define NEW_CHARACTER(n) ((SEXP)0)\n"
    "#define SET_STRING_ELT(a,b,c)\n#define SET_VECTOR_ELT(a,b,c)\n"
    "static double rstub_d[1]; static int rstub_i[1];\n"
    "#define REAL(x) rstub_d\n#define INTEGER(x) rstub_i\n"
    "#define allocVector(t,n) ((SEXP)0)\n#define mkChar(s) ((SEXP)0)\n"
    "#define mkNamed(t,n) ((SEXP)0)\n"
    "#define REALSXP 14\n#define INTSXP 13\n#define STRSXP 16\n#define VECSXP 19\n"
)


@pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.isdir(REF),
    reason="needs gcc and the reference sources",
)
def test_written_model_readable_by_reference_c_reader(tmp_path):
    """Compile the reference's OWN model reader (crf1d_model.c + cqdb.c
    + lookup3.c, unmodified) and assert it reads our Python-written
    .crfsuite file: every label/attr string, every feature weight
    bit-exact, and the CQDB string→id hash lookups round-trip — i.e.
    the exact walk the reference tagger scores with."""
    stub = tmp_path / "rstub"
    stub.mkdir()
    for h in ("R.h", "Rinternals.h", "Rdefines.h"):
        (stub / h).write_text(_R_STUB if h == "R.h" else "")
    (tmp_path / "driver.c").write_text(_C_DRIVER)
    exe = tmp_path / "mcheck"
    subprocess.run(
        ["gcc", "-I", str(stub), "-I", f"{REF}/cqdb/include",
         "-I", f"{REF}/include", "-I", f"{REF}/crf/src",
         "-o", str(exe), str(tmp_path / "driver.c"),
         f"{REF}/crf/src/crf1d_model.c", f"{REF}/cqdb/src/cqdb.c",
         f"{REF}/cqdb/src/lookup3.c"],
        check=True, capture_output=True,
    )
    m = _model()
    path = tmp_path / "model.crfsuite"
    m.to_crfsuite(str(path))
    out = subprocess.run([str(exe), str(path)], check=True,
                         capture_output=True, text=True).stdout
    labels, attrs, states, trans = {}, {}, [], []
    for line in out.splitlines():
        parts = line.split(" ")
        if parts[0] == "label":
            labels[int(parts[1])] = " ".join(parts[2:])
        elif parts[0] == "attr":
            rt = parts[-1]
            assert rt == f"roundtrip={parts[1]}", line  # to_aid == id
            attrs[int(parts[1])] = " ".join(parts[2:-1])
        elif parts[0] == "state":
            states.append((int(parts[1]), int(parts[2]), float(parts[3])))
        elif parts[0] == "trans":
            trans.append((int(parts[1]), int(parts[2]), float(parts[3])))
    exp_states, exp_trans = m.coefficients()
    got = {(attrs[s], labels[d]): w for s, d, w in states}
    exp = {(r.attribute, r.label): r.weight for r in exp_states.itertuples()}
    assert got == exp
    gott = {(labels[s], labels[d]): w for s, d, w in trans}
    expt = {(r.from_label, r.to_label): r.weight for r in exp_trans.itertuples()}
    assert gott == expt
