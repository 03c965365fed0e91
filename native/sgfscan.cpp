// Native SGF main-line scanner — the bulk-SGF role of the reference's
// C++ dataio/sgf.cpp for data-mining commands (writetrainingdata,
// startposes, summarize_sgfs), where python per-character parsing
// dominates wall-clock on large archives.
//
// Parses ONE game's main line (first variation at every branch):
//   - SZ (n or n:m), KM, RE, HA, PB, PW
//   - B/W moves and AB/AW setup stones as flat x_size-stride locs
//     (pass = x*y, matching katago_tpu.dataio.sgf.parse_sgf_loc)
//
// Build: native/build.sh (adds libktsgfscan.so).

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

struct Cursor {
  const char* p;
  const char* end;
  bool ok = true;
};

inline void skip_ws(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\n' || *c.p == '\r' ||
                         *c.p == '\t'))
    c.p++;
}

// read a [...] value with backslash escapes; returns length, writes up
// to cap chars into out (may be null to skip)
inline int64_t read_value(Cursor& c, char* out, int64_t cap) {
  if (c.p >= c.end || *c.p != '[') { c.ok = false; return -1; }
  c.p++;
  int64_t n = 0;
  while (c.p < c.end && *c.p != ']') {
    char ch = *c.p;
    if (ch == '\\' && c.p + 1 < c.end) { c.p++; ch = *c.p; }
    if (out && n < cap - 1) out[n] = ch;
    n++;
    c.p++;
  }
  if (c.p < c.end) c.p++;  // closing ]
  if (out) out[n < cap - 1 ? n : cap - 1] = 0;
  return n;
}

inline int coord_of(char ch) {
  if (ch >= 'a' && ch <= 'z') return ch - 'a';
  if (ch >= 'A' && ch <= 'Z') return ch - 'A' + 26;
  return -1;
}

}  // namespace

extern "C" int64_t kt_sgf_scan_mainline(
    const char* buf, int64_t len,
    int32_t* xy_size,   // out [2]
    float* komi,        // out [1]
    int32_t* handicap,  // out [1]
    int32_t* result,    // out [1]: 0 unknown, 1 B+, 2 W+, 3 draw
    float* margin,      // out [1]: points margin, 0 for R/T/unknown
    int32_t* plas, int32_t* locs, int64_t max_moves,     // out moves
    int32_t* setup_cols, int32_t* setup_locs, int64_t max_setup,
    char* pb, char* pw, int64_t name_cap) {
  Cursor c{buf, buf + len};
  int xs = 19, ys = 19;
  *komi = 7.5f;
  *handicap = 0;
  *result = 0;
  *margin = 0.0f;
  if (name_cap > 0) { pb[0] = 0; pw[0] = 0; }
  int64_t nmoves = 0, nsetup = 0;
  int depth = 0;
  bool seen_close = false;  // after the first ')', siblings are skipped

  char val[256];
  char prop[16];

  while (c.p < c.end) {
    skip_ws(c);
    if (c.p >= c.end) break;
    char ch = *c.p;
    if (ch == '(') {
      if (seen_close) {
        // sibling variation: skip the whole subtree
        int d = 0;
        while (c.p < c.end) {
          if (*c.p == '(') d++;
          else if (*c.p == ')') { d--; if (d == 0) { c.p++; break; } }
          else if (*c.p == '[') read_value(c, nullptr, 0), c.p--;
          c.p++;
        }
        continue;
      }
      depth++;
      c.p++;
      continue;
    }
    if (ch == ')') { seen_close = true; depth--; c.p++;
      if (depth <= 0) break;
      continue; }
    if (ch == ';') { c.p++; continue; }
    if (!((ch >= 'A' && ch <= 'Z'))) { c.p++; continue; }

    // read property identifier
    int pn = 0;
    while (c.p < c.end && *c.p >= 'A' && *c.p <= 'Z') {
      if (pn < 15) prop[pn++] = *c.p;
      c.p++;
    }
    prop[pn] = 0;
    skip_ws(c);
    if (c.p >= c.end || *c.p != '[') continue;

    bool is_b = !strcmp(prop, "B");
    bool is_w = !strcmp(prop, "W");
    bool is_ab = !strcmp(prop, "AB");
    bool is_aw = !strcmp(prop, "AW");
    // consume all [..] values of this property
    bool first = true;
    while (c.p < c.end && *c.p == '[') {
      int64_t n = read_value(c, val, sizeof(val));
      if (!c.ok) return -1;
      if (is_b || is_w) {
        if (first) {
          int32_t loc;
          if (n == 0 || (n == 2 && val[0] == 't' && val[1] == 't' &&
                         xs <= 19 && ys <= 19)) {
            loc = xs * ys;
          } else if (n == 2) {
            int x = coord_of(val[0]), y = coord_of(val[1]);
            if (x < 0 || y < 0 || x >= xs || y >= ys) return -1;
            loc = y * xs + x;
          } else {
            return -1;
          }
          if (nmoves < max_moves) {
            plas[nmoves] = is_b ? 1 : 2;
            locs[nmoves] = loc;
          }
          nmoves++;
        }
      } else if (is_ab || is_aw) {
        if (n == 2) {
          int x = coord_of(val[0]), y = coord_of(val[1]);
          if (x >= 0 && y >= 0 && x < xs && y < ys &&
              nsetup < max_setup) {
            setup_cols[nsetup] = is_ab ? 1 : 2;
            setup_locs[nsetup] = y * xs + x;
            nsetup++;
          }
        }
      } else if (first && !strcmp(prop, "SZ")) {
        char* colon = (char*)memchr(val, ':', n);
        if (colon) {
          *colon = 0;
          xs = atoi(val);
          ys = atoi(colon + 1);
        } else {
          xs = ys = atoi(val);
        }
        if (xs <= 0 || ys <= 0 || xs > 26 || ys > 26) return -1;
      } else if (first && !strcmp(prop, "KM")) {
        *komi = (float)atof(val);
      } else if (first && !strcmp(prop, "HA")) {
        *handicap = atoi(val);
      } else if (first && !strcmp(prop, "RE")) {
        if (val[0] == 'B' || val[0] == 'b') *result = 1;
        else if (val[0] == 'W' || val[0] == 'w') *result = 2;
        else if (val[0] == '0' || val[0] == 'D' || val[0] == 'd' ||
                 !strcmp(val, "Draw")) *result = 3;
        if ((*result == 1 || *result == 2) && val[1] == '+')
          *margin = (float)atof(val + 2);
      } else if (first && !strcmp(prop, "PB")) {
        strncpy(pb, val, name_cap - 1);
        pb[name_cap - 1] = 0;
      } else if (first && !strcmp(prop, "PW")) {
        strncpy(pw, val, name_cap - 1);
        pw[name_cap - 1] = 0;
      }
      first = false;
      skip_ws(c);
    }
  }
  xy_size[0] = xs;
  xy_size[1] = ys;
  return (nmoves << 20) | nsetup;  // packed counts (each < 1M)
}
