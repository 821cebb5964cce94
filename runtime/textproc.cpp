// Native host-side text preprocessing for lda_thesis_tpu.
//
// C++ implementation of the gensim-compatible pipeline in
// lda_thesis_tpu/data/textproc.py (lowercase, strip tags/punctuation/
// numerics/whitespace, stopword + short-word removal, Porter stemming) —
// the hot host path of corpus loading (~10 s in Python for the 4.6k-doc
// abstracts corpus).  Token-for-token parity with the Python pipeline is
// enforced by tests/test_native_textproc.py over the real corpus.
//
// C ABI (driven from Python via ctypes, see data/native.py):
//   ldat_preprocess(buf, offsets, n_docs, stopwords, sw_len) -> char*
//     buf:       UTF-8 concatenation of all documents
//     offsets:   int64[n_docs + 1] document boundaries into buf
//     stopwords: '\n'-joined stopword list
//     returns:   malloc'd buffer, docs separated by '\x1e', tokens by ' ',
//                terminated by '\0' (caller frees with ldat_free)
//
// The Porter stemmer mirrors lda_thesis_tpu/data/porter.py (Porter 1980
// with the two ANSI-C-release departures: abli->able, (m>0) logi->log).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

inline bool is_punct(unsigned char c) {
  // Python string.punctuation: !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~
  static const bool table[256] = {};
  static bool init = false;
  static bool t[256];
  if (!init) {
    const char* p = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~";
    for (int i = 0; i < 256; i++) t[i] = false;
    for (; *p; ++p) t[(unsigned char)*p] = true;
    init = true;
  }
  (void)table;
  return t[c];
}

inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

// ---------------------------------------------------------------------------
// Porter stemmer (byte-level mirror of data/porter.py)
// ---------------------------------------------------------------------------

inline bool is_consonant(const std::string& w, int i) {
  char ch = w[i];
  if (ch == 'a' || ch == 'e' || ch == 'i' || ch == 'o' || ch == 'u')
    return false;
  if (ch == 'y') return i == 0 || !is_consonant(w, i - 1);
  return true;
}

int measure(const std::string& s) {
  int m = 0;
  bool prev_vowel = false;
  for (int i = 0; i < (int)s.size(); i++) {
    bool cons = is_consonant(s, i);
    if (cons && prev_vowel) m++;
    prev_vowel = !cons;
  }
  return m;
}

bool has_vowel(const std::string& s) {
  for (int i = 0; i < (int)s.size(); i++)
    if (!is_consonant(s, i)) return true;
  return false;
}

bool ends_double_consonant(const std::string& s) {
  int n = (int)s.size();
  return n >= 2 && s[n - 1] == s[n - 2] && is_consonant(s, n - 1);
}

bool ends_cvc(const std::string& s) {
  int n = (int)s.size();
  if (n < 3) return false;
  if (!is_consonant(s, n - 3)) return false;
  if (is_consonant(s, n - 2)) return false;
  if (!is_consonant(s, n - 1)) return false;
  char c = s[n - 1];
  return c != 'w' && c != 'x' && c != 'y';
}

inline bool ends_with(const std::string& w, const char* suf) {
  size_t n = strlen(suf);
  return w.size() >= n && memcmp(w.data() + w.size() - n, suf, n) == 0;
}

struct Rule {
  const char* suf;
  const char* rep;
};

const Rule STEP2[] = {
    {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
    {"anci", "ance"},   {"izer", "ize"},    {"abli", "able"},
    {"alli", "al"},     {"entli", "ent"},   {"eli", "e"},
    {"ousli", "ous"},   {"ization", "ize"}, {"ation", "ate"},
    {"ator", "ate"},    {"alism", "al"},    {"iveness", "ive"},
    {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
    {"iviti", "ive"},   {"biliti", "ble"},  {"logi", "log"},
};

const Rule STEP3[] = {
    {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
    {"ical", "ic"},  {"ful", ""},   {"ness", ""},
};

const char* STEP4[] = {"al",  "ance", "ence",  "er",   "ic",  "able", "ible",
                       "ant", "ement", "ment", "ent",  "ion", "ou",   "ism",
                       "ate", "iti",   "ous",  "ive",  "ize"};

std::string map_suffix(const std::string& w, const Rule* rules, int n_rules,
                       int min_m) {
  for (int i = 0; i < n_rules; i++) {
    if (ends_with(w, rules[i].suf)) {
      std::string stem = w.substr(0, w.size() - strlen(rules[i].suf));
      if (measure(stem) > min_m) return stem + rules[i].rep;
      return w;
    }
  }
  return w;
}

std::string porter_stem(const std::string& word) {
  if (word.size() <= 2) return word;
  std::string w = word;

  // step 1a
  if (ends_with(w, "sses")) w.resize(w.size() - 2);
  else if (ends_with(w, "ies")) w.resize(w.size() - 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w.resize(w.size() - 1);

  // step 1b
  if (ends_with(w, "eed")) {
    if (measure(w.substr(0, w.size() - 3)) > 0) w.resize(w.size() - 1);
  } else {
    bool fired = false;
    if (ends_with(w, "ed") && has_vowel(w.substr(0, w.size() - 2))) {
      w.resize(w.size() - 2);
      fired = true;
    } else if (ends_with(w, "ing") && has_vowel(w.substr(0, w.size() - 3))) {
      w.resize(w.size() - 3);
      fired = true;
    }
    if (fired) {
      if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
        w += 'e';
      } else if (ends_double_consonant(w)) {
        char c = w[w.size() - 1];
        if (c != 'l' && c != 's' && c != 'z') w.resize(w.size() - 1);
      } else if (measure(w) == 1 && ends_cvc(w)) {
        w += 'e';
      }
    }
  }

  // step 1c
  if (ends_with(w, "y") && has_vowel(w.substr(0, w.size() - 1)))
    w[w.size() - 1] = 'i';

  w = map_suffix(w, STEP2, sizeof(STEP2) / sizeof(Rule), 0);
  w = map_suffix(w, STEP3, sizeof(STEP3) / sizeof(Rule), 0);

  // step 4
  for (size_t i = 0; i < sizeof(STEP4) / sizeof(char*); i++) {
    if (ends_with(w, STEP4[i])) {
      std::string stem = w.substr(0, w.size() - strlen(STEP4[i]));
      if (measure(stem) > 1) {
        if (strcmp(STEP4[i], "ion") == 0 &&
            (stem.empty() ||
             (stem[stem.size() - 1] != 's' && stem[stem.size() - 1] != 't'))) {
          // keep w
        } else {
          w = stem;
        }
      }
      break;
    }
  }

  // step 5a
  if (ends_with(w, "e")) {
    std::string stem = w.substr(0, w.size() - 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !ends_cvc(stem))) w = stem;
  }
  // step 5b
  if (ends_with(w, "ll") && measure(w) > 1) w.resize(w.size() - 1);
  return w;
}

// UTF-8 codepoint count (Python len() parity for strip_short)
inline size_t cp_len(const std::string& s) {
  size_t n = 0;
  for (unsigned char c : s)
    if ((c & 0xC0) != 0x80) n++;
  return n;
}

}  // namespace

extern "C" {

char* ldat_preprocess(const char* buf, const int64_t* offsets, int64_t n_docs,
                      const char* stopwords_buf, int64_t sw_len) {
  std::unordered_set<std::string> stopwords;
  {
    const char* p = stopwords_buf;
    const char* end = stopwords_buf + sw_len;
    while (p < end) {
      const char* nl = (const char*)memchr(p, '\n', end - p);
      if (!nl) nl = end;
      if (nl > p) stopwords.emplace(p, nl - p);
      p = nl + 1;
    }
  }

  std::string out;
  out.reserve(1 << 20);

  std::string s, tok;
  for (int64_t d = 0; d < n_docs; d++) {
    const char* doc = buf + offsets[d];
    size_t len = (size_t)(offsets[d + 1] - offsets[d]);

    // lowercase (ASCII; multi-byte sequences pass through like Python does
    // for the characters in this corpus — parity-tested), and map Unicode
    // whitespace codepoints (Python \s / str.split semantics) to ' '
    s.clear();
    s.reserve(len);
    for (size_t i = 0; i < len;) {
      unsigned char c = (unsigned char)doc[i];
      if (c == 0xC2 && i + 1 < len &&
          ((unsigned char)doc[i + 1] == 0xA0 ||
           (unsigned char)doc[i + 1] == 0x85)) {
        s += ' ';  // U+00A0 NBSP, U+0085 NEL
        i += 2;
      } else if (c == 0xE2 && i + 2 < len &&
                 (unsigned char)doc[i + 1] == 0x80 &&
                 (((unsigned char)doc[i + 2] >= 0x80 &&
                   (unsigned char)doc[i + 2] <= 0x8A) ||  // U+2000-200A
                  (unsigned char)doc[i + 2] == 0xA8 ||    // U+2028
                  (unsigned char)doc[i + 2] == 0xA9 ||    // U+2029
                  (unsigned char)doc[i + 2] == 0xAF)) {   // U+202F
        s += ' ';
        i += 3;
      } else if (c == 0xE2 && i + 2 < len &&
                 (unsigned char)doc[i + 1] == 0x81 &&
                 (unsigned char)doc[i + 2] == 0x9F) {  // U+205F
        s += ' ';
        i += 3;
      } else if (c == 0xE3 && i + 2 < len &&
                 (unsigned char)doc[i + 1] == 0x80 &&
                 (unsigned char)doc[i + 2] == 0x80) {  // U+3000
        s += ' ';
        i += 3;
      } else if (c == 0xE1 && i + 2 < len &&
                 (unsigned char)doc[i + 1] == 0x9A &&
                 (unsigned char)doc[i + 2] == 0x80) {  // U+1680
        s += ' ';
        i += 3;
      } else {
        s += (c >= 'A' && c <= 'Z') ? (char)(c + 32) : (char)c;
        i += 1;
      }
    }

    // strip_tags: <[^>]+>  -> " "
    std::string t;
    t.reserve(s.size());
    for (size_t i = 0; i < s.size();) {
      if (s[i] == '<') {
        size_t j = i + 1;
        while (j < s.size() && s[j] != '>') j++;
        if (j < s.size() && j > i + 1) {  // matched <...>
          t += ' ';
          i = j + 1;
          continue;
        }
      }
      t += s[i++];
    }

    // strip_punctuation: runs of punctuation -> " "
    std::string u;
    u.reserve(t.size());
    for (size_t i = 0; i < t.size();) {
      if (is_punct((unsigned char)t[i])) {
        while (i < t.size() && is_punct((unsigned char)t[i])) i++;
        u += ' ';
      } else {
        u += t[i++];
      }
    }

    // strip_multiple_whitespaces then strip_numeric (delete digit runs) —
    // applied tokenwise below; Python applies numeric-strip before the
    // stopword check, so digits vanish inside tokens first.
    bool first_tok = true;
    size_t i = 0;
    while (i < u.size()) {
      while (i < u.size() && is_space((unsigned char)u[i])) i++;
      if (i >= u.size()) break;
      tok.clear();
      while (i < u.size() && !is_space((unsigned char)u[i])) {
        char c = u[i++];
        if (c < '0' || c > '9') tok += c;  // strip_numeric
      }
      if (tok.empty()) continue;
      if (stopwords.count(tok)) continue;       // remove_stopwords
      if (cp_len(tok) < 3) continue;            // strip_short
      std::string stemmed = porter_stem(tok);   // stem_text
      if (!first_tok) out += ' ';
      out += stemmed;
      first_tok = false;
    }
    out += '\x1e';  // record separator between documents
  }

  char* res = (char*)malloc(out.size() + 1);
  memcpy(res, out.data(), out.size());
  res[out.size()] = '\0';
  return res;
}

void ldat_free(char* p) { free(p); }

int64_t ldat_version() { return 1; }

}  // extern "C"
