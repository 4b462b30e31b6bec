// Native proof ingest: Plonky2 JSON -> flattened uint64 verifier arrays.
//
// The Python host path (json.loads -> dataclasses -> numpy, ~6.7 ms/proof)
// caps a stream at ~150 proofs/s/core while one v5e chip verifies ~5,400/s
// (docs/performance.md). This extension parses the vkey/proof JSON directly
// into the batch arrays produced by compiler/flatten.py — same layout, same
// shape validation (ValueError on malformed proofs), no intermediate DOM->
// Python objects — and releases the GIL during parse+fill, so a Python
// thread pool scales ingest across host cores.
//
// Schema: the repo's own codecs (types.py to_json/from_json), which mirror
// Plonky2's serde JSON (reference Types.hs:47-279). All scalars are u64.
//
// Build: tools/build_native.py (g++ -O2 -shared -fPIC); loaded lazily by
// plonky2_verifier_tpu/native/__init__.py with a pure-Python fallback.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

namespace {

struct ParseError : std::runtime_error {
  explicit ParseError(const std::string& m) : std::runtime_error(m) {}
};

// ---------------------------------------------------------------------------
// Minimal JSON DOM (numbers are u64; floats/strings beyond keys are rejected
// where the schema never produces them).

struct Val {
  enum Kind : uint8_t { NUM, ARR, OBJ } kind = NUM;
  uint64_t num = 0;
  std::vector<Val> arr;
  std::vector<std::pair<std::string, Val>> obj;

  const Val& at(size_t i) const {
    if (kind != ARR) throw ParseError("expected array");
    if (i >= arr.size()) throw ParseError("array index out of range");
    return arr[i];
  }
  const Val& field(const char* k) const {
    if (kind != OBJ) throw ParseError(std::string("expected object for key ") + k);
    for (auto& kv : obj)
      if (kv.first == k) return kv.second;
    throw ParseError(std::string("missing key: ") + k);
  }
  size_t len() const {
    if (kind != ARR) throw ParseError("expected array (len)");
    return arr.size();
  }
  uint64_t u64() const {
    if (kind != NUM) throw ParseError("expected number");
    return num;
  }
};

struct Parser {
  const char* p;
  const char* end;

  explicit Parser(const char* data, size_t n) : p(data), end(data + n) {}

  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
  }
  char peek() {
    ws();
    if (p >= end) throw ParseError("unexpected end of JSON");
    return *p;
  }
  void expect(char c) {
    if (peek() != c) throw ParseError(std::string("expected '") + c + "'");
    ++p;
  }
  std::string parse_string() {
    expect('"');
    std::string s;
    while (p < end && *p != '"') {
      if (*p == '\\') throw ParseError("escapes not supported in this schema");
      s += *p++;
    }
    if (p >= end) throw ParseError("unterminated string");
    ++p;
    return s;
  }
  uint64_t parse_u64() {
    ws();
    if (p < end && *p == '-') throw ParseError("negative number in proof");
    if (p >= end || *p < '0' || *p > '9') throw ParseError("expected digit");
    uint64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      uint64_t d = uint64_t(*p - '0');
      if (v > (UINT64_MAX - d) / 10) throw ParseError("number exceeds u64");
      v = v * 10 + d;
      ++p;
    }
    if (p < end && (*p == '.' || *p == 'e' || *p == 'E'))
      throw ParseError("non-integer number in proof");
    return v;
  }
  Val parse_value(int depth = 0) {
    if (depth > 64) throw ParseError("JSON nesting too deep");
    Val v;
    char c = peek();
    if (c == '{') {
      ++p;
      v.kind = Val::OBJ;
      if (peek() == '}') { ++p; return v; }
      for (;;) {
        std::string key = parse_string();
        expect(':');
        v.obj.emplace_back(std::move(key), parse_value(depth + 1));
        char d = peek();
        if (d == ',') { ++p; continue; }
        expect('}');
        break;
      }
    } else if (c == '[') {
      ++p;
      v.kind = Val::ARR;
      if (peek() == ']') { ++p; return v; }
      for (;;) {
        v.arr.push_back(parse_value(depth + 1));
        char d = peek();
        if (d == ',') { ++p; continue; }
        expect(']');
        break;
      }
    } else {
      v.kind = Val::NUM;
      v.num = parse_u64();
    }
    return v;
  }
};

// ---------------------------------------------------------------------------
// Shape descriptor + output buffers (borrowed from Python before dropping
// the GIL).

struct StepShape {
  int64_t arity, path_len, cap_len;
};

struct Shape {
  int64_t n_pi, cap_len, n_const_cols, n_sigmas, num_wires, n_zs, n_pp, n_quot,
      n_lookup, final_poly_len, num_queries, initial_path_len;
  int64_t oracle_widths[4];
  std::vector<StepShape> steps;
};

struct Buf {
  uint64_t* data = nullptr;
  int64_t rows = 0;      // batch dimension
  int64_t per_row = 0;   // elements per batch row
};

struct Out {
  Buf circuit_digest, public_inputs, cap_cs, cap_w, cap_zp, cap_q, openings1,
      openings2, final_poly, pow_witness;
  std::vector<Buf> leaves, sibs, step_cap, step_evals, step_sibs;
};

void check(bool cond, const char* msg) {
  if (!cond) throw ParseError(std::string("malformed proof: ") + msg);
}

void put_digest(uint64_t*& w, const Val& d) {
  const Val& e = d.field("elements");
  check(e.len() == 4, "digest width");
  for (int i = 0; i < 4; i++) *w++ = e.at(i).u64();
}

void put_cap(const Buf& b, int64_t row, const Val& cap, int64_t cap_len, const char* msg) {
  check((int64_t)cap.len() == cap_len, msg);
  uint64_t* w = b.data + row * b.per_row;
  for (int64_t i = 0; i < cap_len; i++) put_digest(w, cap.at(i));
}

void put_ext_list(uint64_t*& w, const Val& xs, int64_t n, const char* msg) {
  check((int64_t)xs.len() == n, msg);
  for (int64_t i = 0; i < n; i++) {
    const Val& e = xs.at(i);
    check(e.len() == 2, "extension element width");
    *w++ = e.at(0).u64();
    *w++ = e.at(1).u64();
  }
}

void fill_one(const Shape& sh, Out& out, int64_t row, const Val& vkey, const Val& pwp) {
  const Val& proof = pwp.field("proof");
  const Val& pis = pwp.field("public_inputs");
  const Val& op = proof.field("openings");
  const Val& fp = proof.field("opening_proof");

  check((int64_t)pis.len() == sh.n_pi, "public input count");
  uint64_t* w = out.public_inputs.data + row * out.public_inputs.per_row;
  for (int64_t i = 0; i < sh.n_pi; i++) *w++ = pis.at(i).u64();

  w = out.circuit_digest.data + row * out.circuit_digest.per_row;
  put_digest(w, vkey.field("circuit_digest"));
  put_cap(out.cap_cs, row, vkey.field("constants_sigmas_cap"), sh.cap_len, "constants cap size");
  put_cap(out.cap_w, row, proof.field("wires_cap"), sh.cap_len, "wires cap size");
  put_cap(out.cap_zp, row, proof.field("plonk_zs_partial_products_cap"), sh.cap_len, "zs/pp cap size");
  put_cap(out.cap_q, row, proof.field("quotient_polys_cap"), sh.cap_len, "quotient cap size");

  // openings, transcript batch order (Challenge/FRI.hs:46-61)
  w = out.openings1.data + row * out.openings1.per_row;
  put_ext_list(w, op.field("constants"), sh.n_const_cols, "constants openings");
  put_ext_list(w, op.field("plonk_sigmas"), sh.n_sigmas, "sigma openings");
  put_ext_list(w, op.field("wires"), sh.num_wires, "wire openings");
  put_ext_list(w, op.field("plonk_zs"), sh.n_zs, "zs openings");
  put_ext_list(w, op.field("partial_products"), sh.n_pp, "pp openings");
  put_ext_list(w, op.field("quotient_polys"), sh.n_quot, "quotient openings");
  put_ext_list(w, op.field("lookup_zs"), sh.n_lookup, "lookup openings");
  w = out.openings2.data + row * out.openings2.per_row;
  put_ext_list(w, op.field("plonk_zs_next"), sh.n_zs, "zs_next openings");
  put_ext_list(w, op.field("lookup_zs_next"), sh.n_lookup, "lookup_next openings");

  w = out.final_poly.data + row * out.final_poly.per_row;
  put_ext_list(w, fp.field("final_poly").field("coeffs"), sh.final_poly_len, "final poly length");
  out.pow_witness.data[row] = fp.field("pow_witness").u64();

  const Val& caps = fp.field("commit_phase_merkle_caps");
  check((int64_t)caps.len() == (int64_t)sh.steps.size(), "commit phase caps");
  for (size_t s = 0; s < sh.steps.size(); s++)
    put_cap(out.step_cap[s], row, caps.at(s), sh.steps[s].cap_len, "step cap size");

  const Val& rounds = fp.field("query_round_proofs");
  check((int64_t)rounds.len() == sh.num_queries, "query round count");
  for (int64_t q = 0; q < sh.num_queries; q++) {
    const Val& rd = rounds.at(q);
    const Val& eps = rd.field("initial_trees_proof").field("evals_proofs");
    check(eps.len() == 4, "4 initial oracles");
    for (int o = 0; o < 4; o++) {
      const Val& pair = eps.at(o);
      check(pair.len() == 2, "evals_proofs entry");
      const Val& leaf = pair.at(0);
      const Val& sibs = pair.at(1).field("siblings");
      int64_t wdt = sh.oracle_widths[o];
      check((int64_t)leaf.len() == wdt, "oracle leaf width");
      check((int64_t)sibs.len() == sh.initial_path_len, "oracle path length");
      uint64_t* lw = out.leaves[o].data + row * out.leaves[o].per_row + q * wdt;
      for (int64_t i = 0; i < wdt; i++) *lw++ = leaf.at(i).u64();
      uint64_t* sw = out.sibs[o].data + row * out.sibs[o].per_row + q * sh.initial_path_len * 4;
      for (int64_t l = 0; l < sh.initial_path_len; l++) put_digest(sw, sibs.at(l));
    }
    const Val& steps = rd.field("steps");
    check((int64_t)steps.len() == (int64_t)sh.steps.size(), "fold step count");
    for (size_t s = 0; s < sh.steps.size(); s++) {
      const Val& st = steps.at(s);
      int64_t arity = sh.steps[s].arity, plen = sh.steps[s].path_len;
      uint64_t* ew = out.step_evals[s].data + row * out.step_evals[s].per_row + q * arity * 2;
      put_ext_list(ew, st.field("evals"), arity, "step coset size");
      const Val& ss = st.field("merkle_proof").field("siblings");
      check((int64_t)ss.len() == plen, "step path length");
      uint64_t* sw = out.step_sibs[s].data + row * out.step_sibs[s].per_row + q * plen * 4;
      for (int64_t l = 0; l < plen; l++) put_digest(sw, ss.at(l));
    }
  }
}

// ---------------------------------------------------------------------------
// Python boundary

int64_t dict_i64(PyObject* d, const char* k) {
  PyObject* v = PyDict_GetItemString(d, k);  // borrowed
  if (!v) throw ParseError(std::string("shape missing key ") + k);
  int64_t r = PyLong_AsLongLong(v);
  if (r == -1 && PyErr_Occurred()) throw ParseError(std::string("bad shape value ") + k);
  return r;
}

Shape read_shape(PyObject* d) {
  Shape sh;
  sh.n_pi = dict_i64(d, "n_pi");
  sh.cap_len = dict_i64(d, "cap_len");
  sh.n_const_cols = dict_i64(d, "n_const_cols");
  sh.n_sigmas = dict_i64(d, "n_sigmas");
  sh.num_wires = dict_i64(d, "num_wires");
  sh.n_zs = dict_i64(d, "n_zs");
  sh.n_pp = dict_i64(d, "n_pp");
  sh.n_quot = dict_i64(d, "n_quot");
  sh.n_lookup = dict_i64(d, "n_lookup");
  sh.final_poly_len = dict_i64(d, "final_poly_len");
  sh.num_queries = dict_i64(d, "num_queries");
  sh.initial_path_len = dict_i64(d, "initial_path_len");
  PyObject* ow = PyDict_GetItemString(d, "oracle_widths");
  if (!ow || !PyList_Check(ow) || PyList_Size(ow) != 4) throw ParseError("oracle_widths");
  for (int i = 0; i < 4; i++) sh.oracle_widths[i] = PyLong_AsLongLong(PyList_GetItem(ow, i));
  PyObject* st = PyDict_GetItemString(d, "steps");
  if (!st || !PyList_Check(st)) throw ParseError("steps");
  for (Py_ssize_t i = 0; i < PyList_Size(st); i++) {
    PyObject* e = PyList_GetItem(st, i);
    StepShape s;
    s.arity = dict_i64(e, "arity");
    s.path_len = dict_i64(e, "path_len");
    s.cap_len = dict_i64(e, "cap_len");
    sh.steps.push_back(s);
  }
  return sh;
}

struct Buffers {
  std::vector<Py_buffer> views;
  ~Buffers() {
    for (auto& v : views) PyBuffer_Release(&v);
  }
  Buf get(PyObject* dict, const std::string& key) {
    PyObject* arr = PyDict_GetItemString(dict, key.c_str());  // borrowed
    if (!arr) throw ParseError("output dict missing " + key);
    Py_buffer view;
    if (PyObject_GetBuffer(arr, &view, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0) {
      PyErr_Clear();
      throw ParseError("array for " + key + " is not a writable C-contiguous buffer");
    }
    views.push_back(view);
    if (view.itemsize != 8 || !(view.format && (view.format[0] == 'L' || view.format[0] == 'Q')))
      throw ParseError("array for " + key + " must be uint64");
    Buf b;
    b.data = static_cast<uint64_t*>(view.buf);
    b.rows = view.ndim > 0 ? view.shape[0] : 1;
    int64_t total = view.len / 8;
    b.per_row = b.rows ? total / b.rows : 0;
    return b;
  }
};

// flatten_into(shape_dict, out_dict, row, vkey_bytes, proof_bytes)
PyObject* flatten_into(PyObject*, PyObject* args) {
  PyObject *shape_d, *out_d;
  Py_ssize_t row;
  const char *vk_buf, *pf_buf;
  Py_ssize_t vk_len, pf_len;
  if (!PyArg_ParseTuple(args, "O!O!ny#y#", &PyDict_Type, &shape_d, &PyDict_Type,
                        &out_d, &row, &vk_buf, &vk_len, &pf_buf, &pf_len))
    return nullptr;
  try {
    Shape sh = read_shape(shape_d);
    Buffers bufs;
    Out out;
    out.circuit_digest = bufs.get(out_d, "circuit_digest");
    out.public_inputs = bufs.get(out_d, "public_inputs");
    out.cap_cs = bufs.get(out_d, "cap_cs");
    out.cap_w = bufs.get(out_d, "cap_w");
    out.cap_zp = bufs.get(out_d, "cap_zp");
    out.cap_q = bufs.get(out_d, "cap_q");
    out.openings1 = bufs.get(out_d, "openings1");
    out.openings2 = bufs.get(out_d, "openings2");
    out.final_poly = bufs.get(out_d, "final_poly");
    out.pow_witness = bufs.get(out_d, "pow_witness");
    for (int o = 0; o < 4; o++) {
      out.leaves.push_back(bufs.get(out_d, "leaves_" + std::to_string(o)));
      out.sibs.push_back(bufs.get(out_d, "sibs_" + std::to_string(o)));
    }
    for (size_t s = 0; s < sh.steps.size(); s++) {
      out.step_cap.push_back(bufs.get(out_d, "step_cap_" + std::to_string(s)));
      out.step_evals.push_back(bufs.get(out_d, "step_evals_" + std::to_string(s)));
      out.step_sibs.push_back(bufs.get(out_d, "step_sibs_" + std::to_string(s)));
    }
    if (row < 0 || row >= out.circuit_digest.rows) throw ParseError("row out of range");

    // no Python API below this point: parse + fill without the GIL so a
    // thread pool scales ingest across host cores
    std::string err;
    Py_BEGIN_ALLOW_THREADS;
    try {
      Parser vp(vk_buf, (size_t)vk_len);
      Val vkey = vp.parse_value();
      Parser pp(pf_buf, (size_t)pf_len);
      Val pwp = pp.parse_value();
      fill_one(sh, out, row, vkey, pwp);
    } catch (const std::exception& e) {
      err = e.what();
    }
    Py_END_ALLOW_THREADS;
    if (!err.empty()) throw ParseError(err);
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_ValueError, e.what());
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"flatten_into", flatten_into, METH_VARARGS,
     "flatten_into(shape, out_arrays, row, vkey_json, proof_json): parse one "
     "proof's JSON into row `row` of the flattened uint64 batch arrays."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moddef = {PyModuleDef_HEAD_INIT, "p2v_fastload",
                      "Native Plonky2 proof JSON -> verifier array ingest",
                      -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_p2v_fastload() { return PyModule_Create(&moddef); }
