// BM25 inverted-index engine — native replacement for the Anserini/Lucene
// stack vendored by the reference (v1/retrievers/bm25_retriever/, SURVEY.md
// §2c). C API over ctypes; term ids are assigned by the Python analyzer.
//
// Scoring: Lucene/Anserini BM25 —
//   idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
//   score(d) = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len/avg))
// (Anserini defaults k1 = 0.9, b = 0.4.)
//
// Layout: docs stream in via add_doc (internal ids = arrival order);
// finalize() builds CSR postings (term -> [doc, tf]); search() scores
// term-at-a-time into a dense accumulator and partial-sorts top-k. The
// accumulator approach is exact and cache-friendly at corpus sizes the
// reference targets (tens of millions of docs).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <exception>
#include <vector>

namespace {

struct BM25Index {
  float k1;
  float b;
  bool finalized = false;

  // build-time: per-doc term lists (deduped with tf)
  std::vector<std::vector<std::pair<int32_t, int32_t>>> doc_terms;
  std::vector<int32_t> doc_len;

  // finalized: CSR postings
  int32_t num_terms = 0;
  std::vector<int64_t> offsets;     // [num_terms + 1]
  std::vector<int32_t> post_docs;   // doc ids
  std::vector<int32_t> post_tfs;    // term frequencies
  std::vector<float> idf;           // [num_terms]
  double avg_len = 0.0;
};

}  // namespace

extern "C" {

BM25Index* bm25_create(float k1, float b) {
  auto* idx = new BM25Index();
  idx->k1 = k1;
  idx->b = b;
  return idx;
}

void bm25_free(BM25Index* idx) { delete idx; }

// term_ids need not be unique; tf is counted here.
void bm25_add_doc(BM25Index* idx, const int32_t* term_ids, int32_t len) {
  std::vector<int32_t> terms(term_ids, term_ids + len);
  std::sort(terms.begin(), terms.end());
  std::vector<std::pair<int32_t, int32_t>> uniq;
  for (int32_t i = 0; i < len;) {
    int32_t j = i;
    while (j < len && terms[j] == terms[i]) j++;
    uniq.emplace_back(terms[i], j - i);
    if (terms[i] + 1 > idx->num_terms) idx->num_terms = terms[i] + 1;
    i = j;
  }
  idx->doc_terms.push_back(std::move(uniq));
  idx->doc_len.push_back(len);
}

void bm25_finalize(BM25Index* idx) {
  const int64_t n_docs = (int64_t)idx->doc_terms.size();
  std::vector<int64_t> df(idx->num_terms, 0);
  int64_t total_postings = 0, total_len = 0;
  for (int64_t d = 0; d < n_docs; d++) {
    for (auto& [t, tf] : idx->doc_terms[d]) df[t]++;
    total_postings += (int64_t)idx->doc_terms[d].size();
    total_len += idx->doc_len[d];
  }
  idx->avg_len = n_docs ? (double)total_len / n_docs : 0.0;

  idx->offsets.assign(idx->num_terms + 1, 0);
  for (int32_t t = 0; t < idx->num_terms; t++)
    idx->offsets[t + 1] = idx->offsets[t] + df[t];
  idx->post_docs.resize(total_postings);
  idx->post_tfs.resize(total_postings);
  std::vector<int64_t> cursor(idx->offsets.begin(), idx->offsets.end() - 1);
  for (int64_t d = 0; d < n_docs; d++) {
    for (auto& [t, tf] : idx->doc_terms[d]) {
      int64_t pos = cursor[t]++;
      idx->post_docs[pos] = (int32_t)d;
      idx->post_tfs[pos] = tf;
    }
  }
  idx->idf.resize(idx->num_terms);
  for (int32_t t = 0; t < idx->num_terms; t++)
    idx->idf[t] = (float)std::log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5));

  idx->doc_terms.clear();
  idx->doc_terms.shrink_to_fit();
  idx->finalized = true;
}

int64_t bm25_num_docs(BM25Index* idx) { return (int64_t)idx->doc_len.size(); }

// Returns number of results written (= min(k, docs with score > 0)).
int32_t bm25_search(BM25Index* idx, const int32_t* query_terms, int32_t qlen,
                    int32_t k, int32_t* out_docs, float* out_scores) {
  if (!idx->finalized) return -1;
  const int64_t n_docs = (int64_t)idx->doc_len.size();
  std::vector<float> acc(n_docs, 0.0f);
  std::vector<int32_t> touched;
  touched.reserve(4096);

  for (int32_t qi = 0; qi < qlen; qi++) {
    int32_t t = query_terms[qi];
    if (t < 0 || t >= idx->num_terms) continue;
    const float idf = idx->idf[t];
    const float k1 = idx->k1, b = idx->b;
    const double avg = idx->avg_len > 0 ? idx->avg_len : 1.0;
    for (int64_t p = idx->offsets[t]; p < idx->offsets[t + 1]; p++) {
      const int32_t d = idx->post_docs[p];
      const float tf = (float)idx->post_tfs[p];
      const float norm = k1 * (1.0f - b + b * (float)(idx->doc_len[d] / avg));
      if (acc[d] == 0.0f) touched.push_back(d);
      acc[d] += idf * tf * (k1 + 1.0f) / (tf + norm);
    }
  }

  const int32_t n = (int32_t)std::min<int64_t>(k, (int64_t)touched.size());
  std::partial_sort(
      touched.begin(), touched.begin() + n, touched.end(),
      [&acc](int32_t a, int32_t b2) {
        if (acc[a] != acc[b2]) return acc[a] > acc[b2];
        return a < b2;  // deterministic tie-break by doc id
      });
  for (int32_t i = 0; i < n; i++) {
    out_docs[i] = touched[i];
    out_scores[i] = acc[touched[i]];
  }
  return n;
}

int32_t bm25_save(BM25Index* idx, const char* path) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const int64_t n_docs = (int64_t)idx->doc_len.size();
  const int64_t n_post = (int64_t)idx->post_docs.size();
  std::fwrite(&idx->k1, sizeof(float), 1, f);
  std::fwrite(&idx->b, sizeof(float), 1, f);
  std::fwrite(&idx->num_terms, sizeof(int32_t), 1, f);
  std::fwrite(&n_docs, sizeof(int64_t), 1, f);
  std::fwrite(&n_post, sizeof(int64_t), 1, f);
  std::fwrite(&idx->avg_len, sizeof(double), 1, f);
  std::fwrite(idx->doc_len.data(), sizeof(int32_t), n_docs, f);
  std::fwrite(idx->offsets.data(), sizeof(int64_t), idx->num_terms + 1, f);
  std::fwrite(idx->post_docs.data(), sizeof(int32_t), n_post, f);
  std::fwrite(idx->post_tfs.data(), sizeof(int32_t), n_post, f);
  std::fwrite(idx->idf.data(), sizeof(float), idx->num_terms, f);
  std::fclose(f);
  return 0;
}

BM25Index* bm25_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* idx = new BM25Index();
  int64_t n_docs = 0, n_post = 0;
  bool ok = std::fread(&idx->k1, sizeof(float), 1, f) == 1 &&
            std::fread(&idx->b, sizeof(float), 1, f) == 1 &&
            std::fread(&idx->num_terms, sizeof(int32_t), 1, f) == 1 &&
            std::fread(&n_docs, sizeof(int64_t), 1, f) == 1 &&
            std::fread(&n_post, sizeof(int64_t), 1, f) == 1 &&
            std::fread(&idx->avg_len, sizeof(double), 1, f) == 1;
  // validate header fields before trusting them: a truncated/corrupt
  // file could carry negative or absurd sizes, and a resize() throw
  // would otherwise escape the extern "C" boundary into ctypes (UB)
  // instead of the documented nullptr -> Python IOError path
  constexpr int64_t kMaxElems = int64_t(1) << 40;  // ~1T entries: sanity cap
  if (ok && (idx->num_terms < 0 || n_docs < 0 || n_post < 0 ||
             idx->num_terms > kMaxElems || n_docs > kMaxElems ||
             n_post > kMaxElems)) {
    ok = false;
  }
  if (ok) {
    try {
      idx->doc_len.resize(n_docs);
      idx->offsets.resize(idx->num_terms + 1);
      idx->post_docs.resize(n_post);
      idx->post_tfs.resize(n_post);
      idx->idf.resize(idx->num_terms);
    } catch (const std::exception&) {
      ok = false;
    }
    if (ok) {
      ok = std::fread(idx->doc_len.data(), sizeof(int32_t), n_docs, f) == (size_t)n_docs &&
           std::fread(idx->offsets.data(), sizeof(int64_t), idx->num_terms + 1, f) == (size_t)(idx->num_terms + 1) &&
           std::fread(idx->post_docs.data(), sizeof(int32_t), n_post, f) == (size_t)n_post &&
           std::fread(idx->post_tfs.data(), sizeof(int32_t), n_post, f) == (size_t)n_post &&
           std::fread(idx->idf.data(), sizeof(float), idx->num_terms, f) == (size_t)idx->num_terms;
    }
  }
  std::fclose(f);
  if (!ok) {
    delete idx;
    return nullptr;
  }
  idx->finalized = true;
  return idx;
}

}  // extern "C"
