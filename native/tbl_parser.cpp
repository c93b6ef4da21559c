// Fast columnar parser for TPC-H dbgen .tbl files ('|'-delimited).
//
// TPU-native analog of the reference's C++ CSV/broker load path
// (be/src/exec/csv_scanner.cpp, be/src/formats/csv/): the host-side ingest
// is the one place the engine keeps native code — parsing SF100 .tbl text
// in Python would bottleneck loading long before the TPU sees a byte.
//
// Python (ctypes) drives it in two passes:
//   1. tbl_count_rows(path)                        -> row count
//   2. tbl_parse(path, ncols, types, out_ptrs, …)  -> fills preallocated
//      numpy buffers: int64 for INT/DECIMAL(cents)/BOOL, int32 for DATE
//      (days since 1970-01-01), and for STRING columns two int64 arrays
//      (byte offset, length) into the file image, which Python then
//      dictionary-encodes.
//
// Build: g++ -O3 -shared -fPIC -o libtblparse.so tbl_parser.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

enum ColType : int32_t {
  COL_INT64 = 0,
  COL_DECIMAL = 1,   // scale digits given separately; emits scaled int64
  COL_DATE = 2,      // YYYY-MM-DD -> days since epoch (int32)
  COL_STRING = 3,    // emits (offset,int64) + (length,int64)
};

// days from civil date (Howard Hinnant's algorithm)
static int64_t days_from_civil(int y, int m, int d) {
  y -= m <= 2;
  const int era = (y >= 0 ? y : y - 399) / 400;
  const unsigned yoe = static_cast<unsigned>(y - era * 400);
  const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097LL + static_cast<int64_t>(doe) - 719468LL;
}

// Read whole file; returns buffer (caller frees with tbl_free) and size.
char* tbl_read(const char* path, int64_t* size_out) {
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

void tbl_free(char* buf) { free(buf); }

int64_t tbl_count_rows(const char* buf, int64_t size) {
  int64_t n = 0;
  for (int64_t i = 0; i < size; i++) n += (buf[i] == '\n');
  return n;
}

// Parse the in-memory file image into preallocated column buffers.
// types[c]: ColType; scales[c]: decimal scale.
// out[c]: int64* (INT64/DECIMAL), int32* (DATE), int64* offsets (STRING).
// lens[c]: int64* lengths for STRING columns (null otherwise).
// Returns number of rows parsed, or -1 on malformed input.
int64_t tbl_parse(const char* buf, int64_t size, int32_t ncols,
                  const int32_t* types, const int32_t* scales,
                  void** out, void** lens) {
  int64_t row = 0;
  int64_t i = 0;
  while (i < size) {
    for (int32_t c = 0; c < ncols; c++) {
      int64_t start = i;
      while (i < size && buf[i] != '|' && buf[i] != '\n') i++;
      int64_t end = i;
      switch (types[c]) {
        case COL_INT64: {
          int64_t v = 0; bool neg = false; int64_t j = start;
          if (j < end && buf[j] == '-') { neg = true; j++; }
          for (; j < end; j++) v = v * 10 + (buf[j] - '0');
          static_cast<int64_t*>(out[c])[row] = neg ? -v : v;
          break;
        }
        case COL_DECIMAL: {
          int64_t v = 0; bool neg = false; int64_t j = start;
          int32_t frac_seen = -1;
          if (j < end && buf[j] == '-') { neg = true; j++; }
          for (; j < end; j++) {
            if (buf[j] == '.') { frac_seen = 0; continue; }
            if (frac_seen >= 0) {
              if (frac_seen >= scales[c]) continue;  // truncate extra digits
              frac_seen++;
            }
            v = v * 10 + (buf[j] - '0');
          }
          int32_t pad = scales[c] - (frac_seen < 0 ? 0 : frac_seen);
          for (int32_t p = 0; p < pad; p++) v *= 10;
          static_cast<int64_t*>(out[c])[row] = neg ? -v : v;
          break;
        }
        case COL_DATE: {
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
      if (i < size && buf[i] == '|') i++;  // field separator
    }
    // consume trailing newline (dbgen rows end "...|\n")
    while (i < size && buf[i] != '\n') i++;
    i++;
    row++;
  }
  return row;
}

}  // extern "C"
