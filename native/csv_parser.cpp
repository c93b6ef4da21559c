// Fast columnar CSV parser (RFC-4180 quoting, configurable delimiter,
// optional header, empty-field NULLs).
//
// TPU-native analog of the reference's CSV scan path
// (be/src/formats/csv/csv_reader.cpp, be/src/exec/csv_scanner.cpp): host-side
// ingest stays native C++ — parsing gigabytes of text in Python would
// bottleneck loading long before the TPU sees a byte. Shares the .tbl
// parser's two-pass protocol (count rows, then fill preallocated numpy
// buffers) plus per-column validity bytes for NULLs.
//
// Quoting: a field starting with '"' runs to the matching unescaped quote;
// "" inside is a literal quote. Quoted fields may contain delimiters and
// newlines. String columns emit (offset, length) into the file image; when
// the field was quoted the span excludes the outer quotes (embedded ""
// un-escaping is done in Python — rare enough not to need a copy pass here).
//
// Build: g++ -O3 -shared -fPIC -o libcsvparse.so csv_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

enum ColType : int32_t {
  COL_INT64 = 0,
  COL_DECIMAL = 1,   // scale digits given separately; emits scaled int64
  COL_DATE = 2,      // YYYY-MM-DD -> days since epoch (int32)
  COL_STRING = 3,    // emits (offset,int64) + (length,int64)
  COL_FLOAT64 = 4,
};

// days from civil date (Howard Hinnant's public-domain algorithm)
static int64_t days_from_civil(int y, int m, int d) {
  y -= m <= 2;
  const int era = (y >= 0 ? y : y - 399) / 400;
  const unsigned yoe = static_cast<unsigned>(y - era * 400);
  const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097LL + static_cast<int64_t>(doe) - 719468LL;
}

char* csv_read(const char* path, int64_t* size_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(malloc(sz + 1));
  if (!buf) { fclose(f); return nullptr; }
  size_t rd = fread(buf, 1, sz, f);
  fclose(f);
  if (static_cast<long>(rd) != sz) { free(buf); return nullptr; }
  buf[sz] = '\n';
  *size_out = sz;
  return buf;
}

void csv_free(char* buf) { free(buf); }

// Count DATA rows (quote-aware: newlines inside quotes don't end a record;
// a final record without trailing newline still counts).
int64_t csv_count_rows(const char* buf, int64_t size, int32_t skip_header) {
  int64_t n = 0;
  bool in_quotes = false, in_record = false;
  for (int64_t i = 0; i < size; i++) {
    char c = buf[i];
    if (in_quotes) {
      if (c == '"') {
        if (i + 1 < size && buf[i + 1] == '"') i++;   // escaped quote
        else in_quotes = false;
      }
      continue;
    }
    if (c == '"') { in_quotes = true; in_record = true; }
    else if (c == '\n') { if (in_record) n++; in_record = false; }
    else if (c != '\r') in_record = true;
  }
  if (in_record) n++;
  return n - (skip_header ? 1 : 0);
}

// Parse into preallocated buffers. valid[c]: uint8* per-row validity
// (empty unquoted field -> 0). Returns rows parsed or -1 on malformed input.
int64_t csv_parse(const char* buf, int64_t size, int32_t ncols,
                  const int32_t* types, const int32_t* scales,
                  void** out, void** lens, void** valid,
                  char delim, int32_t skip_header) {
  int64_t i = 0;
  if (skip_header) {              // skip the header record (quote-aware)
    bool q = false;
    while (i < size) {
      char c = buf[i];
      if (q) { if (c == '"') { if (i + 1 < size && buf[i + 1] == '"') i++;
                               else q = false; } }
      else if (c == '"') q = true;
      else if (c == '\n') { i++; break; }
      i++;
    }
  }
  int64_t row = 0;
  while (i < size) {
    // skip blank lines / trailing CRLF-only records
    if (buf[i] == '\n') { i++; continue; }
    if (buf[i] == '\r' && i + 1 < size && buf[i + 1] == '\n') { i += 2; continue; }
    for (int32_t c = 0; c < ncols; c++) {
      int64_t start, end;
      bool quoted = false;
      if (i < size && buf[i] == '"') {
        quoted = true;
        i++;
        start = i;
        while (i < size) {
          if (buf[i] == '"') {
            if (i + 1 < size && buf[i + 1] == '"') { i += 2; continue; }
            break;
          }
          i++;
        }
        end = i;
        if (i < size) i++;                 // closing quote
      } else {
        start = i;
        while (i < size && buf[i] != delim && buf[i] != '\n'
               && buf[i] != '\r') i++;
        end = i;
      }
      bool is_null = (!quoted && end == start);
      if (valid[c]) static_cast<uint8_t*>(valid[c])[row] = is_null ? 0 : 1;
      switch (types[c]) {
        case COL_INT64: {
          int64_t v = 0; bool neg = false; int64_t j = start;
          if (j < end && (buf[j] == '-' || buf[j] == '+')) { neg = buf[j] == '-'; j++; }
          for (; j < end; j++) {
            if (buf[j] < '0' || buf[j] > '9') return -1;
            v = v * 10 + (buf[j] - '0');
          }
          static_cast<int64_t*>(out[c])[row] = is_null ? 0 : (neg ? -v : v);
          break;
        }
        case COL_DECIMAL: {
          int64_t v = 0; bool neg = false; int64_t j = start;
          int32_t frac_seen = -1;
          if (j < end && (buf[j] == '-' || buf[j] == '+')) { neg = buf[j] == '-'; j++; }
          for (; j < end; j++) {
            if (buf[j] == '.') { frac_seen = 0; continue; }
            if (buf[j] < '0' || buf[j] > '9') return -1;
            if (frac_seen >= 0) {
              if (frac_seen >= scales[c]) continue;   // truncate extra digits
              frac_seen++;
            }
            v = v * 10 + (buf[j] - '0');
          }
          int32_t pad = scales[c] - (frac_seen < 0 ? 0 : frac_seen);
          for (int32_t p = 0; p < pad; p++) v *= 10;
          static_cast<int64_t*>(out[c])[row] = is_null ? 0 : (neg ? -v : v);
          break;
        }
        case COL_FLOAT64: {
          char tmp[64];
          int64_t n = end - start;
          double v = 0.0;
          if (!is_null && n > 0 && n < 63) {
            memcpy(tmp, buf + start, n);
            tmp[n] = 0;
            v = strtod(tmp, nullptr);
          }
          static_cast<double*>(out[c])[row] = v;
          break;
        }
        case COL_DATE: {
          if (is_null) { static_cast<int32_t*>(out[c])[row] = 0; break; }
          if (end - start < 10) return -1;
          int y = (buf[start] - '0') * 1000 + (buf[start + 1] - '0') * 100 +
                  (buf[start + 2] - '0') * 10 + (buf[start + 3] - '0');
          int m = (buf[start + 5] - '0') * 10 + (buf[start + 6] - '0');
          int d = (buf[start + 8] - '0') * 10 + (buf[start + 9] - '0');
          static_cast<int32_t*>(out[c])[row] =
              static_cast<int32_t>(days_from_civil(y, m, d));
          break;
        }
        case COL_STRING: {
          static_cast<int64_t*>(out[c])[row] = start;
          static_cast<int64_t*>(lens[c])[row] = end - start;
          break;
        }
        default:
          return -1;
      }
      if (i < size && buf[i] == delim && c + 1 < ncols) i++;
    }
    while (i < size && buf[i] != '\n') i++;    // trailing CR / extra fields
    i++;
    row++;
  }
  return row;
}

}  // extern "C"
