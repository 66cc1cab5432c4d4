// Native ONNX protobuf wire scanner: the weight-loading fast path.
//
// C++ counterpart of the reference's native model-ingestion core (the
// reference parses ONNX in native code behind pybind11 — weights flow
// through GraphHandlerObj/TensorObj::copyin without ever being touched by
// Python; reference src/ffi/ffi_infinitensor.cc:478-541,
// pyinfinitensor/src/pyinfinitensor/onnx.py:41-1136). Here the Python
// frontend owns message semantics, but the O(model-size) byte scan —
// locating the GraphProto and indexing every initializer's name / dtype /
// dims / payload span — runs natively so multi-GB weight files are never
// sliced through Python. The host then maps payloads with zero-copy
// numpy.frombuffer views.
//
// Exposed through a C ABI (ctypes); see infinitensor_tpu/native/onnx_wire.py.

#include <cstdint>

namespace {

constexpr int kVarint = 0;
constexpr int kFixed64 = 1;
constexpr int kLength = 2;
constexpr int kFixed32 = 5;

// Parse one varint; returns new position or -1 on truncation/overflow.
int64_t read_varint(const uint8_t* buf, int64_t pos, int64_t len,
                    uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (pos < len && shift < 64) {
    uint8_t b = buf[pos++];
    v |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = v;
      return pos;
    }
    shift += 7;
  }
  return -1;
}

// Skip a field's payload. Returns new position or -1.
int64_t skip_field(const uint8_t* buf, int64_t pos, int64_t len, int wt) {
  uint64_t v;
  switch (wt) {
    case kVarint:
      return read_varint(buf, pos, len, &v);
    case kFixed64:
      return pos + 8 <= len ? pos + 8 : -1;
    case kLength: {
      pos = read_varint(buf, pos, len, &v);
      if (pos < 0 || pos + static_cast<int64_t>(v) > len) return -1;
      return pos + static_cast<int64_t>(v);
    }
    case kFixed32:
      return pos + 4 <= len ? pos + 4 : -1;
    default:
      return -1;
  }
}

constexpr int kMaxDims = 12;

// TensorProto payload-field numbers double as data_kind codes; 0 = absent,
// -1 = irregular (host must run its full parser on the message span).
constexpr int32_t kKindNone = 0;
constexpr int32_t kKindIrregular = -1;

struct InitDesc {
  int64_t msg_off, msg_len;    // TensorProto message payload span
  int64_t name_off, name_len;  // name bytes span
  int32_t data_type;
  int32_t n_dims;              // -1 => too many dims, fall back
  int64_t dims[kMaxDims];
  int32_t data_kind;  // 9 raw, 4 f32, 10 f64, 5/7/11 packed varints, -1 fb
  int64_t data_off, data_len;
};

// Scan one TensorProto message. Fills `d`; on any structure this scanner
// does not model (repeated payload fields, unpacked scalars, external
// data, segments) it degrades to data_kind = irregular rather than erring:
// the host parses just that message in Python.
bool scan_tensor_proto(const uint8_t* buf, int64_t off, int64_t len,
                       InitDesc* d) {
  d->msg_off = off;
  d->msg_len = len;
  d->name_off = d->name_len = 0;
  d->data_type = 0;
  d->n_dims = 0;
  d->data_kind = kKindNone;
  d->data_off = d->data_len = 0;

  int64_t pos = off, end = off + len;
  while (pos < end) {
    uint64_t tag;
    pos = read_varint(buf, pos, end, &tag);
    if (pos < 0) return false;
    int field = static_cast<int>(tag >> 3);
    int wt = static_cast<int>(tag & 7);

    if (field == 1) {  // dims: packed or repeated varint
      if (wt == kVarint) {
        uint64_t v;
        pos = read_varint(buf, pos, end, &v);
        if (pos < 0) return false;
        if (d->n_dims >= 0) {
          if (d->n_dims < kMaxDims)
            d->dims[d->n_dims++] = static_cast<int64_t>(v);
          else
            d->n_dims = -1;
        }
      } else if (wt == kLength) {
        uint64_t plen;
        pos = read_varint(buf, pos, end, &plen);
        if (pos < 0 || pos + static_cast<int64_t>(plen) > end) return false;
        int64_t pend = pos + static_cast<int64_t>(plen);
        while (pos < pend) {
          uint64_t v;
          pos = read_varint(buf, pos, pend, &v);
          if (pos < 0) return false;
          if (d->n_dims >= 0) {
            if (d->n_dims < kMaxDims)
              d->dims[d->n_dims++] = static_cast<int64_t>(v);
            else
              d->n_dims = -1;
          }
        }
      } else {
        return false;
      }
    } else if (field == 2 && wt == kVarint) {  // data_type
      uint64_t v;
      pos = read_varint(buf, pos, end, &v);
      if (pos < 0) return false;
      d->data_type = static_cast<int32_t>(v);
    } else if (field == 8 && wt == kLength) {  // name
      uint64_t plen;
      pos = read_varint(buf, pos, end, &plen);
      if (pos < 0 || pos + static_cast<int64_t>(plen) > end) return false;
      d->name_off = pos;
      d->name_len = static_cast<int64_t>(plen);
      pos += static_cast<int64_t>(plen);
    } else if ((field == 4 || field == 5 || field == 7 || field == 9 ||
                field == 10 || field == 11)) {  // payload fields
      if (wt != kLength) {  // unpacked repeated scalar: rare — fall back
        d->data_kind = kKindIrregular;
        pos = skip_field(buf, pos, end, wt);
        if (pos < 0) return false;
        continue;
      }
      uint64_t plen;
      pos = read_varint(buf, pos, end, &plen);
      if (pos < 0 || pos + static_cast<int64_t>(plen) > end) return false;
      if (d->data_kind == kKindNone) {
        d->data_kind = field;
        d->data_off = pos;
        d->data_len = static_cast<int64_t>(plen);
      } else {
        d->data_kind = kKindIrregular;  // repeated payload chunks
      }
      pos += static_cast<int64_t>(plen);
    } else if (field == 13 || field == 14 ||
               field == 3 || field == 6 || field == 12) {
      // external_data / data_location / segment / doc_string / metadata:
      // external data needs the host's file resolution — fall back.
      if (field == 13 || field == 14 || field == 3)
        d->data_kind = kKindIrregular;
      pos = skip_field(buf, pos, end, wt);
      if (pos < 0) return false;
    } else {
      pos = skip_field(buf, pos, end, wt);
      if (pos < 0) return false;
    }
  }
  if (d->n_dims < 0) d->data_kind = kKindIrregular;
  return pos == end;
}

}  // namespace

extern "C" {

// Locate the GraphProto (ModelProto field 7) payload span. Returns 0 on
// success, -1 if absent or the buffer is malformed.
int onnx_locate_graph(const uint8_t* buf, int64_t len, int64_t* graph_off,
                      int64_t* graph_len) {
  int64_t pos = 0;
  int found = -1;
  while (pos < len) {
    uint64_t tag;
    pos = read_varint(buf, pos, len, &tag);
    if (pos < 0) return -1;
    int field = static_cast<int>(tag >> 3);
    int wt = static_cast<int>(tag & 7);
    if (field == 7 && wt == kLength) {
      uint64_t plen;
      pos = read_varint(buf, pos, len, &plen);
      if (pos < 0 || pos + static_cast<int64_t>(plen) > len) return -1;
      *graph_off = pos;
      *graph_len = static_cast<int64_t>(plen);
      pos += static_cast<int64_t>(plen);
      found = 0;  // last one wins, matching protobuf merge semantics
    } else {
      pos = skip_field(buf, pos, len, wt);
      if (pos < 0) return -1;
    }
  }
  return found;
}

// Count initializer fields (GraphProto field 5) in [buf, buf+len).
// Returns -1 on malformed input.
int64_t onnx_count_initializers(const uint8_t* buf, int64_t off,
                                int64_t glen) {
  int64_t pos = off, end = off + glen, n = 0;
  while (pos < end) {
    uint64_t tag;
    pos = read_varint(buf, pos, end, &tag);
    if (pos < 0) return -1;
    int field = static_cast<int>(tag >> 3);
    int wt = static_cast<int>(tag & 7);
    if (field == 5 && wt == kLength) ++n;
    pos = skip_field(buf, pos, end, wt);
    if (pos < 0) return -1;
  }
  return n;
}

// Scan initializers within the GraphProto span [off, off+glen) of `buf`.
// All output offsets are absolute within `buf`. Arrays must hold max_n
// entries (dims: max_n * 12). Returns the number filled, or -1 on
// malformed input (host falls back to the pure-Python parser).
int64_t onnx_scan_initializers(
    const uint8_t* buf, int64_t off, int64_t glen, int64_t max_n,
    int64_t* msg_off, int64_t* msg_len, int64_t* name_off, int64_t* name_len,
    int32_t* data_type, int32_t* n_dims, int64_t* dims, int32_t* data_kind,
    int64_t* data_off, int64_t* data_len) {
  int64_t pos = off, end = off + glen, n = 0;
  while (pos < end) {
    uint64_t tag;
    pos = read_varint(buf, pos, end, &tag);
    if (pos < 0) return -1;
    int field = static_cast<int>(tag >> 3);
    int wt = static_cast<int>(tag & 7);
    if (field == 5 && wt == kLength) {
      uint64_t plen;
      pos = read_varint(buf, pos, end, &plen);
      if (pos < 0 || pos + static_cast<int64_t>(plen) > end) return -1;
      if (n >= max_n) return -1;
      InitDesc d;
      if (!scan_tensor_proto(buf, pos, static_cast<int64_t>(plen), &d))
        return -1;
      msg_off[n] = d.msg_off;
      msg_len[n] = d.msg_len;
      name_off[n] = d.name_off;
      name_len[n] = d.name_len;
      data_type[n] = d.data_type;
      n_dims[n] = d.n_dims;
      for (int i = 0; i < kMaxDims; ++i)
        dims[n * kMaxDims + i] = i < d.n_dims ? d.dims[i] : 0;
      data_kind[n] = d.data_kind;
      data_off[n] = d.data_off;
      data_len[n] = d.data_len;
      ++n;
      pos += static_cast<int64_t>(plen);
    } else {
      pos = skip_field(buf, pos, end, wt);
      if (pos < 0) return -1;
    }
  }
  return n;
}

}  // extern "C"
