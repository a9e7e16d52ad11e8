// BM25 inverted index + batch searcher.
//
// TPU-native replacement for the reference's Lucene/pyserini dependency
// (models/retrievers/bm25.py shells into `pyserini.index.lucene` + JNI
// LuceneSearcher — no JVM exists in this environment).  Host-side C++ because
// BM25 is pointer-chasing over posting lists, not MXU work.
//
// Behaviour matches pyserini defaults: k1=0.9, b=0.4 (Anserini/pyserini
// SimpleSearcher defaults), Lucene-style English analysis (lowercase, standard
// stopword set, Porter stemming), Lucene BM25 idf = ln(1 + (N-df+0.5)/(df+0.5)).
//
// C ABI for Python ctypes binding (bergen_tpu/models/retrievers/bm25.py).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Porter stemmer (classic algorithm, Porter 1980)
// ---------------------------------------------------------------------------
class PorterStemmer {
 public:
  std::string stem(const std::string& w) {
    if (w.size() <= 2) return w;
    b = w;
    k = static_cast<int>(b.size()) - 1;
    step1ab();
    step1c();
    step2();
    step3();
    step4();
    step5();
    return b.substr(0, k + 1);
  }

 private:
  std::string b;
  int k = 0, j = 0;

  bool cons(int i) const {
    switch (b[i]) {
      case 'a': case 'e': case 'i': case 'o': case 'u':
        return false;
      case 'y':
        return (i == 0) ? true : !cons(i - 1);
      default:
        return true;
    }
  }

  int m() const {
    int n = 0, i = 0;
    while (true) {
      if (i > j) return n;
      if (!cons(i)) break;
      i++;
    }
    i++;
    while (true) {
      while (true) {
        if (i > j) return n;
        if (cons(i)) break;
        i++;
      }
      i++;
      n++;
      while (true) {
        if (i > j) return n;
        if (!cons(i)) break;
        i++;
      }
      i++;
    }
  }

  bool vowelinstem() const {
    for (int i = 0; i <= j; i++)
      if (!cons(i)) return true;
    return false;
  }

  bool doublec(int i) const {
    if (i < 1) return false;
    if (b[i] != b[i - 1]) return false;
    return cons(i);
  }

  bool cvc(int i) const {
    if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false;
    char ch = b[i];
    return ch != 'w' && ch != 'x' && ch != 'y';
  }

  bool ends(const char* s) {
    int len = static_cast<int>(std::strlen(s));
    if (len > k + 1) return false;
    if (b.compare(k - len + 1, len, s) != 0) return false;
    j = k - len;
    return true;
  }

  void setto(const char* s) {
    int len = static_cast<int>(std::strlen(s));
    b = b.substr(0, j + 1) + s + b.substr(k + 1);
    k = j + len;
  }

  void r(const char* s) {
    if (m() > 0) setto(s);
  }

  void step1ab() {
    if (b[k] == 's') {
      if (ends("sses")) k -= 2;
      else if (ends("ies")) setto("i");
      else if (b[k - 1] != 's') k--;
    }
    if (ends("eed")) {
      if (m() > 0) k--;
    } else if ((ends("ed") || ends("ing")) && vowelinstem()) {
      k = j;
      if (ends("at")) setto("ate");
      else if (ends("bl")) setto("ble");
      else if (ends("iz")) setto("ize");
      else if (doublec(k)) {
        k--;
        char ch = b[k];
        if (ch == 'l' || ch == 's' || ch == 'z') k++;
      } else if (m() == 1 && cvc(k)) setto("e");
    }
  }

  void step1c() {
    if (ends("y") && vowelinstem()) b[k] = 'i';
  }

  void step2() {
    if (k < 1) return;
    switch (b[k - 1]) {
      case 'a':
        if (ends("ational")) { r("ate"); break; }
        if (ends("tional")) { r("tion"); break; }
        break;
      case 'c':
        if (ends("enci")) { r("ence"); break; }
        if (ends("anci")) { r("ance"); break; }
        break;
      case 'e':
        if (ends("izer")) { r("ize"); break; }
        break;
      case 'l':
        if (ends("bli")) { r("ble"); break; }
        if (ends("alli")) { r("al"); break; }
        if (ends("entli")) { r("ent"); break; }
        if (ends("eli")) { r("e"); break; }
        if (ends("ousli")) { r("ous"); break; }
        break;
      case 'o':
        if (ends("ization")) { r("ize"); break; }
        if (ends("ation")) { r("ate"); break; }
        if (ends("ator")) { r("ate"); break; }
        break;
      case 's':
        if (ends("alism")) { r("al"); break; }
        if (ends("iveness")) { r("ive"); break; }
        if (ends("fulness")) { r("ful"); break; }
        if (ends("ousness")) { r("ous"); break; }
        break;
      case 't':
        if (ends("aliti")) { r("al"); break; }
        if (ends("iviti")) { r("ive"); break; }
        if (ends("biliti")) { r("ble"); break; }
        break;
      case 'g':
        if (ends("logi")) { r("log"); break; }
        break;
    }
  }

  void step3() {
    switch (b[k]) {
      case 'e':
        if (ends("icate")) { r("ic"); break; }
        if (ends("ative")) { r(""); break; }
        if (ends("alize")) { r("al"); break; }
        break;
      case 'i':
        if (ends("iciti")) { r("ic"); break; }
        break;
      case 'l':
        if (ends("ical")) { r("ic"); break; }
        if (ends("ful")) { r(""); break; }
        break;
      case 's':
        if (ends("ness")) { r(""); break; }
        break;
    }
  }

  void step4() {
    if (k < 1) return;
    switch (b[k - 1]) {
      case 'a': if (ends("al")) break; return;
      case 'c': if (ends("ance") || ends("ence")) break; return;
      case 'e': if (ends("er")) break; return;
      case 'i': if (ends("ic")) break; return;
      case 'l': if (ends("able") || ends("ible")) break; return;
      case 'n':
        if (ends("ant") || ends("ement") || ends("ment") || ends("ent")) break;
        return;
      case 'o':
        if (ends("ion") && j >= 0 && (b[j] == 's' || b[j] == 't')) break;
        if (ends("ou")) break;
        return;
      case 's': if (ends("ism")) break; return;
      case 't': if (ends("ate") || ends("iti")) break; return;
      case 'u': if (ends("ous")) break; return;
      case 'v': if (ends("ive")) break; return;
      case 'z': if (ends("ize")) break; return;
      default: return;
    }
    if (m() > 1) k = j;
  }

  void step5() {
    j = k;
    if (b[k] == 'e') {
      int a = m();
      if (a > 1 || (a == 1 && !cvc(k - 1))) k--;
    }
    if (b[k] == 'l' && doublec(k) && m() > 1) k--;
  }
};

// Lucene EnglishAnalyzer default stopword set
const char* kStopwords[] = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will",
    "with"};

struct Analyzer {
  std::unordered_map<std::string, bool> stop;
  PorterStemmer stemmer;

  Analyzer() {
    for (const char* s : kStopwords) stop[s] = true;
  }

  std::vector<std::string> tokenize(const char* text) {
    std::vector<std::string> out;
    std::string cur;
    for (const char* p = text; *p; ++p) {
      unsigned char c = static_cast<unsigned char>(*p);
      if (std::isalnum(c) || c >= 0x80) {  // keep UTF-8 bytes in-token
        cur.push_back(static_cast<char>(std::tolower(c)));
      } else if (!cur.empty()) {
        if (!stop.count(cur)) out.push_back(stemmer.stem(cur));
        cur.clear();
      }
    }
    if (!cur.empty() && !stop.count(cur)) out.push_back(stemmer.stem(cur));
    return out;
  }
};

struct Posting {
  int32_t doc;
  int32_t tf;
};

struct Index {
  float k1 = 0.9f;
  float b = 0.4f;
  int32_t n_docs = 0;
  double avgdl = 0.0;
  std::vector<int32_t> doc_len;
  std::unordered_map<std::string, std::vector<Posting>> postings;
  Analyzer analyzer;

  void add_doc(int32_t doc_id, const char* text) {
    auto toks = analyzer.tokenize(text);
    doc_len.push_back(static_cast<int32_t>(toks.size()));
    std::unordered_map<std::string, int32_t> tfs;
    for (auto& t : toks) tfs[t]++;
    for (auto& [term, tf] : tfs) postings[term].push_back({doc_id, tf});
    n_docs++;
  }

  void finalize() {
    double total = 0;
    for (auto l : doc_len) total += l;
    avgdl = n_docs ? total / n_docs : 0.0;
  }

  // Per-searcher scratch: a DENSE float accumulator (one slot per doc) plus
  // the list of touched docs.  Replaces the round-3 unordered_map
  // accumulator — a hash probe per posting was the searcher's hot cost;
  // the dense array is a single indexed add (the classic score-accumulator
  // layout Lucene/Anserini use).  Each thread owns one Scratch (the Porter
  // stemmer inside Analyzer is stateful, so Analyzer is per-thread too).
  struct Scratch {
    std::vector<float> acc;
    std::vector<int32_t> touched;
    Analyzer analyzer;
  };

  // Lucene BM25: idf = ln(1 + (N - df + 0.5) / (df + 0.5))
  void search_with(Scratch& s, const char* query, int k, int32_t* out_docs,
                   float* out_scores) const {
    auto q_toks = s.analyzer.tokenize(query);
    if (static_cast<int32_t>(s.acc.size()) < n_docs) s.acc.assign(n_docs, 0.f);
    s.touched.clear();
    for (auto& t : q_toks) {
      auto it = postings.find(t);
      if (it == postings.end()) continue;
      const auto& plist = it->second;
      double df = static_cast<double>(plist.size());
      double idf = std::log(1.0 + (n_docs - df + 0.5) / (df + 0.5));
      for (const auto& p : plist) {
        // every per-term partial score is > 0, so 0 marks "untouched"
        if (s.acc[p.doc] == 0.f) s.touched.push_back(p.doc);
        double norm = k1 * (1.0 - b + b * doc_len[p.doc] / avgdl);
        s.acc[p.doc] += static_cast<float>(idf * (p.tf / (p.tf + norm)));
      }
    }
    using Entry = std::pair<float, int32_t>;  // (score, -doc) max ordering
    std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> heap;
    for (int32_t doc : s.touched) {
      float sc = s.acc[doc];
      if (static_cast<int>(heap.size()) < k) {
        heap.push({sc, -doc});
      } else if (sc > heap.top().first) {
        heap.pop();
        heap.push({sc, -doc});
      }
      s.acc[doc] = 0.f;  // reset for the next query
    }
    int n = static_cast<int>(heap.size());
    for (int i = n - 1; i >= 0; --i) {
      out_docs[i] = -heap.top().second;
      out_scores[i] = heap.top().first;
      heap.pop();
    }
    for (int i = n; i < k; ++i) {
      out_docs[i] = -1;
      out_scores[i] = 0.0f;
    }
  }

  void search(const char* query, int k, int32_t* out_docs, float* out_scores) {
    search_with(scratch, query, k, out_docs, out_scores);
  }

  // Threaded batch search — the reference passes `threads` to Lucene's
  // batch_search (models/retrievers/bm25.py:28-31); the index is read-only
  // here and each thread owns its Scratch/Analyzer.
  void batch_search(const char* const* queries, int32_t nq, int32_t k,
                    int32_t threads, int32_t* out_docs,
                    float* out_scores) const {
    if (threads < 1) threads = 1;
    threads = std::min<int32_t>(threads, nq > 0 ? nq : 1);
    auto worker = [&](int32_t tid) {
      Scratch s;
      for (int32_t qi = tid; qi < nq; qi += threads) {
        search_with(s, queries[qi], k, out_docs + (int64_t)qi * k,
                    out_scores + (int64_t)qi * k);
      }
    };
    if (threads == 1) {
      worker(0);
      return;
    }
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int32_t t = 0; t < threads; ++t) pool.emplace_back(worker, t);
    for (auto& th : pool) th.join();
  }

  Scratch scratch;  // single-call API reuse

  // ---- binary serialization --------------------------------------------
  bool save(const char* path) const {
    std::ofstream f(path, std::ios::binary);
    if (!f) return false;
    const char magic[8] = {'B', 'M', '2', '5', 'I', 'D', 'X', '1'};
    f.write(magic, 8);
    f.write(reinterpret_cast<const char*>(&k1), sizeof(k1));
    f.write(reinterpret_cast<const char*>(&b), sizeof(b));
    f.write(reinterpret_cast<const char*>(&n_docs), sizeof(n_docs));
    f.write(reinterpret_cast<const char*>(&avgdl), sizeof(avgdl));
    f.write(reinterpret_cast<const char*>(doc_len.data()),
            doc_len.size() * sizeof(int32_t));
    uint64_t n_terms = postings.size();
    f.write(reinterpret_cast<const char*>(&n_terms), sizeof(n_terms));
    for (const auto& [term, plist] : postings) {
      uint32_t tlen = static_cast<uint32_t>(term.size());
      uint64_t plen = plist.size();
      f.write(reinterpret_cast<const char*>(&tlen), sizeof(tlen));
      f.write(term.data(), tlen);
      f.write(reinterpret_cast<const char*>(&plen), sizeof(plen));
      f.write(reinterpret_cast<const char*>(plist.data()),
              plen * sizeof(Posting));
    }
    return f.good();
  }

  bool load(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) return false;
    char magic[8];
    f.read(magic, 8);
    if (std::memcmp(magic, "BM25IDX1", 8) != 0) return false;
    f.read(reinterpret_cast<char*>(&k1), sizeof(k1));
    f.read(reinterpret_cast<char*>(&b), sizeof(b));
    f.read(reinterpret_cast<char*>(&n_docs), sizeof(n_docs));
    f.read(reinterpret_cast<char*>(&avgdl), sizeof(avgdl));
    doc_len.resize(n_docs);
    f.read(reinterpret_cast<char*>(doc_len.data()), n_docs * sizeof(int32_t));
    uint64_t n_terms;
    f.read(reinterpret_cast<char*>(&n_terms), sizeof(n_terms));
    postings.clear();
    postings.reserve(n_terms);
    for (uint64_t i = 0; i < n_terms; ++i) {
      uint32_t tlen;
      uint64_t plen;
      f.read(reinterpret_cast<char*>(&tlen), sizeof(tlen));
      std::string term(tlen, '\0');
      f.read(term.data(), tlen);
      f.read(reinterpret_cast<char*>(&plen), sizeof(plen));
      std::vector<Posting> plist(plen);
      f.read(reinterpret_cast<char*>(plist.data()), plen * sizeof(Posting));
      postings.emplace(std::move(term), std::move(plist));
    }
    return f.good();
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

void* bm25_create(float k1, float b) {
  auto* idx = new Index();
  idx->k1 = k1;
  idx->b = b;
  return idx;
}

void bm25_add_doc(void* h, int32_t doc_id, const char* text) {
  static_cast<Index*>(h)->add_doc(doc_id, text);
}

void bm25_finalize(void* h) { static_cast<Index*>(h)->finalize(); }

int bm25_save(void* h, const char* path) {
  return static_cast<Index*>(h)->save(path) ? 0 : -1;
}

void* bm25_load(const char* path) {
  auto* idx = new Index();
  if (!idx->load(path)) {
    delete idx;
    return nullptr;
  }
  return idx;
}

int32_t bm25_num_docs(void* h) { return static_cast<Index*>(h)->n_docs; }

void bm25_batch_search(void* h, const char* const* queries, int32_t nq,
                       int32_t k, int32_t threads, int32_t* out_docs,
                       float* out_scores) {
  static_cast<Index*>(h)->batch_search(queries, nq, k, threads, out_docs,
                                       out_scores);
}

void bm25_search(void* h, const char* query, int32_t k, int32_t* out_docs,
                 float* out_scores) {
  static_cast<Index*>(h)->search(query, k, out_docs, out_scores);
}

void bm25_free(void* h) { delete static_cast<Index*>(h); }

}  // extern "C"
