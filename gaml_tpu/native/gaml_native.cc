// Native host kernels for gaml_tpu.
//
// C ABI, built with plain g++ (see build.py), loaded via ctypes.  Three
// groups:
//  - maxhash_window_query: the sliding-window max-hash genome query
//    (semantics of reference GetMinHashWithPoses, graph.cc:1289-1323);
//  - process_hit_batch: the exact 0-1 BFS seed extension
//    (reference ProcessHit, graph.cc:753-837) over a candidate batch —
//    the bit-parity "bfs" backend's fast path;
//  - reach_limit_compute / reach_big_compute: the per-node Dijkstra/BFS
//    reachability precomputes (reference graph.cc:108-198).
//
// All outputs are bit-identical to the Python implementations (tested in
// tests/test_native.py).

#define _USE_MATH_DEFINES
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <queue>
#include <set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- maxhash
// seq: 2-bit-coded bases (0..3; >=4 hashes as 0). Emits collapsed
// (hash, kmer_end_pos) pairs for read_len-wide windows. Returns count
// (clipped to cap).
int64_t maxhash_window_query(const uint8_t* seq, int64_t n, int32_t read_len,
                             uint64_t* out_hash, int32_t* out_pos,
                             int64_t cap) {
  const int K = 15;
  const uint64_t XOR = 0x2204abcdULL;
  const uint64_t MASK = (1ULL << (2 * K)) - 1;
  if (n < K || n < read_len) return 0;
  int64_t count = 0;
  std::deque<std::pair<uint64_t, int64_t>> d;
  uint64_t cur = 0;
  for (int64_t i = 0; i < K; i++) {
    cur = (cur << 2) | (seq[i] < 4 ? seq[i] : 0);
  }
  uint64_t mh = cur ^ XOR;
  d.push_back({mh, K - 1});
  uint64_t last_mh = 0;
  bool have_last = false;
  for (int64_t i = K; i < n; i++) {
    while (!d.empty() && d.front().second < i - read_len + K) d.pop_front();
    cur = ((cur << 2) & MASK) | (seq[i] < 4 ? seq[i] : 0);
    uint64_t h = cur ^ XOR;
    while (!d.empty() && d.back().first < h) d.pop_back();
    d.push_back({h, i});
    if (i >= read_len - 1) {
      uint64_t mhx = d.front().first;
      if (i == read_len - 1 || !have_last || mhx != last_mh) {
        if (count < cap) {
          out_hash[count] = mhx;
          out_pos[count] = (int32_t)d.front().second;
        }
        count++;
        last_mh = mhx;
        have_last = true;
      }
    }
  }
  return count < cap ? count : cap;
}

// ------------------------------------------------------------- ProcessHit
// Exact reference 0-1 BFS (graph.cc:753-837), including the push-marked
// visited set and its search-order artifacts.  Returns via out arrays:
// errs = -1 on failure; begin as in the reference (may be -1 for
// genome-start seeds).
static void process_hit_one(const uint8_t* genome, int64_t glen,
                            const uint8_t* read, int32_t rlen, int32_t g0,
                            int32_t r0, int32_t* out_errs,
                            int32_t* out_begin,
                            std::vector<int32_t>& visited, int32_t& stamp,
                            int32_t vdim) {
  const int K = 15;
  const int ERROR_LIMIT = 3;
  stamp++;
  auto vis = [&](int32_t r, int64_t g) -> int32_t& {
    int64_t gp = g - g0 + r0 + 20;
    return visited[(int64_t)(r + 1) * vdim + gp];
  };
  auto gch = [&](int64_t g) -> int {
    return (g >= 0 && g < glen) ? genome[g] : -1;
  };
  *out_errs = -1;
  *out_begin = -1;

  std::deque<std::pair<int, std::pair<int64_t, int32_t>>> fr;
  fr.push_back({0, {g0 + K, r0 + K}});
  int forward_errs = -1;
  while (!fr.empty()) {
    auto x = fr.front();
    fr.pop_front();
    int cost = x.first;
    int64_t g = x.second.first;
    int32_t r = x.second.second;
    if (cost > ERROR_LIMIT) break;
    if (r == rlen) {
      forward_errs = cost;
      break;
    }
    if (gch(g) == read[r]) {
      if (g + 1 < glen || r + 1 == rlen) {
        if (vis(r + 1, g + 1) != stamp) {
          vis(r + 1, g + 1) = stamp;
          fr.push_front({cost, {g + 1, r + 1}});
        }
      }
    } else {
      if (g + 1 < glen) {
        if (vis(r + 1, g + 1) != stamp) {
          vis(r + 1, g + 1) = stamp;
          fr.push_back({cost + 1, {g + 1, r + 1}});
        }
        if (vis(r, g + 1) != stamp) {
          vis(r, g + 1) = stamp;
          fr.push_back({cost + 1, {g + 1, r}});
        }
      }
      if (vis(r + 1, g) != stamp) {
        vis(r + 1, g) = stamp;
        fr.push_back({cost + 1, {g, r + 1}});
      }
    }
  }
  if (forward_errs == -1) return;

  int backward_errs = -1;
  int64_t begin_pos = -1;
  if (g0 == 0) {
    if (r0 < 6) backward_errs = r0;
  } else {
    fr.clear();
    stamp++;
    fr.push_back({0, {g0 - 1, r0 - 1}});
    while (!fr.empty()) {
      auto x = fr.front();
      fr.pop_front();
      int cost = x.first;
      int64_t g = x.second.first;
      int32_t r = x.second.second;
      if (cost > ERROR_LIMIT) break;
      if (r == -1) {
        backward_errs = cost;
        begin_pos = g + 1;
        break;
      }
      if (gch(g) == read[r]) {
        if (g - 1 >= 0 || r - 1 == -1) {
          if (vis(r - 1, g - 1) != stamp) {
            vis(r - 1, g - 1) = stamp;
            fr.push_front({cost, {g - 1, r - 1}});
          }
        }
      } else {
        if (g - 1 >= 0) {
          if (vis(r - 1, g - 1) != stamp) {
            vis(r - 1, g - 1) = stamp;
            fr.push_back({cost + 1, {g - 1, r - 1}});
          }
          if (vis(r, g - 1) != stamp) {
            vis(r, g - 1) = stamp;
            fr.push_back({cost + 1, {g - 1, r}});
          }
        }
        if (vis(r - 1, g) != stamp) {
          vis(r - 1, g) = stamp;
          fr.push_back({cost + 1, {g, r - 1}});
        }
      }
    }
  }
  if (backward_errs == -1) return;
  *out_errs = forward_errs + backward_errs;
  *out_begin = (int32_t)begin_pos;
}

void process_hit_batch(const uint8_t* genome, int64_t glen,
                       const uint8_t* reads, const int64_t* read_offsets,
                       const int32_t* rlens, const int32_t* g0s,
                       const int32_t* r0s, int64_t n, int32_t* out_errs,
                       int32_t* out_begin) {
  int32_t max_rlen = 0;
  for (int64_t i = 0; i < n; i++)
    if (rlens[i] > max_rlen) max_rlen = rlens[i];
  int32_t vdim = max_rlen + 47;
  std::vector<int32_t> visited((int64_t)(max_rlen + 47) * vdim, 0);
  int32_t stamp = 0;
  for (int64_t i = 0; i < n; i++) {
    process_hit_one(genome, glen, reads + read_offsets[i], rlens[i], g0s[i],
                    r0s[i], out_errs + i, out_begin + i, visited, stamp,
                    vdim);
  }
}

// ------------------------------------------------------- paired pair loop
// The incremental paired scorer's hot inner loop (reference
// CalcScoreForPathInc pair products, graph.cc:1853-1892): for each read,
// all (pos1, pos2) combos in innie geometry emit p1*p2*insert_pdf(dist)
// in x-major order, plus coverage events for pairs above the threshold.
// Sequential float64 arithmetic in the same order as the Python loop —
// bit-identical, C speed.
int64_t paired_inc_pairs(
    const int32_t* rids, int32_t n_rids,
    const int64_t* p1_start, const int32_t* p1_cnt,
    const int32_t* pos1, const int32_t* ed1, const int32_t* or1,
    const int64_t* p2_start, const int32_t* p2_cnt,
    const int32_t* pos2, const int32_t* ed2, const int32_t* or2,
    const int32_t* rlen1, const int32_t* rlen2,
    const double* match_pow1, const double* mismatch_pow1,
    const double* match_pow2, const double* mismatch_pow2,
    const double* ins_table, int64_t ins_n, double ins_mean, double ins_std,
    double min_prob_start, double min_prob_per_base, int32_t use_all_to_cov,
    double* out_p, int32_t* out_rid,
    int32_t* out_ev_pos, int32_t* out_ev_typ, int64_t* out_ev_cnt) {
  int64_t np = 0;
  int64_t ne = 0;
  const double two_pi_c = sqrt(2.0 * M_PI) * ins_std;
  for (int32_t ri = 0; ri < n_rids; ri++) {
    int32_t rid = rids[ri];
    // quirk: threshold uses read_set2's length twice (graph.cc:1855-1857)
    double threshold =
        exp(min_prob_start + min_prob_per_base * (rlen2[ri] + rlen2[ri]));
    const int32_t* xp = pos1 + p1_start[ri];
    const int32_t* xe = ed1 + p1_start[ri];
    const int32_t* xo = or1 + p1_start[ri];
    const int32_t* yp = pos2 + p2_start[ri];
    const int32_t* ye = ed2 + p2_start[ri];
    const int32_t* yo = or2 + p2_start[ri];
    for (int32_t i = 0; i < p1_cnt[ri]; i++) {
      double p1v = mismatch_pow1[xe[i]] * match_pow1[rlen1[ri] - xe[i]];
      for (int32_t j = 0; j < p2_cnt[ri]; j++) {
        if (xo[i] == yo[j]) continue;
        int64_t dist;
        if (xp[i] < yp[j]) {
          if (xo[i] != 0 || yo[j] != 1) continue;
          dist = (int64_t)yp[j] - xp[i] + rlen2[ri];
        } else {
          if (xo[i] != 1 || yo[j] != 0) continue;
          dist = (int64_t)xp[i] - yp[j] + rlen1[ri];
        }
        double p2v = mismatch_pow2[ye[j]] * match_pow2[rlen2[ri] - ye[j]];
        double insprob;
        if (dist >= 0 && dist < ins_n) {
          insprob = ins_table[dist];
        } else {
          double z = ((double)dist - ins_mean) / ins_std;
          insprob = exp(-z * z / 2.0) / two_pi_c;
        }
        double p = p1v * p2v * insprob;
        if (p > threshold) {
          out_ev_pos[ne] = xp[i] > yp[j] ? xp[i] : yp[j];
          out_ev_typ[ne] = 3;
          ne++;
          if (use_all_to_cov) {
            out_ev_pos[ne] = xp[i] < yp[j] ? xp[i] : yp[j];
            out_ev_typ[ne] = 3;
            ne++;
          }
        }
        out_p[np] = p;
        out_rid[np] = rid;
        np++;
      }
    }
  }
  *out_ev_cnt = ne;
  return np;
}

// ----------------------------------------------------------- reachability
struct ReachResult {
  std::vector<int32_t> data;  // records: from, to, len, path...
};

void* reach_limit_compute(int32_t n_nodes, const int32_t* csr_start,
                          const int32_t* csr_idx, const int32_t* node_lens,
                          int32_t max_dist) {
  ReachResult* res = new ReachResult();
  std::vector<int32_t> final_dist(n_nodes), tmp_dist(n_nodes),
      prev(n_nodes);
  for (int32_t i = 0; i < n_nodes; i++) {
    std::priority_queue<std::pair<int32_t, int32_t>,
                        std::vector<std::pair<int32_t, int32_t>>,
                        std::greater<std::pair<int32_t, int32_t>>> fr;
    fr.push({0, i});
    std::fill(final_dist.begin(), final_dist.end(), -1);
    std::fill(tmp_dist.begin(), tmp_dist.end(), 2 * max_dist);
    std::fill(prev.begin(), prev.end(), -1);
    tmp_dist[i] = 0;
    prev[i] = -2;
    while (!fr.empty()) {
      auto [d, x] = fr.top();
      fr.pop();
      if (final_dist[x] != -1) continue;
      final_dist[x] = d;
      int32_t nd = d;
      if (x != i) {
        std::vector<int32_t> pp;
        int32_t cur = prev[x];
        while (cur != i) {
          pp.push_back(cur);
          cur = prev[cur];
        }
        res->data.push_back(i);
        res->data.push_back(x);
        res->data.push_back((int32_t)pp.size());
        for (auto it = pp.rbegin(); it != pp.rend(); ++it)
          res->data.push_back(*it);
        nd += node_lens[x];
      }
      for (int32_t j = csr_start[x]; j < csr_start[x + 1]; j++) {
        int32_t nx = csr_idx[j];
        if (tmp_dist[nx] > nd && nd <= max_dist) {
          tmp_dist[nx] = nd;
          prev[nx] = x;
          fr.push({nd, nx});
        }
      }
    }
  }
  return res;
}

void* reach_big_compute(int32_t n_nodes, const int32_t* csr_start,
                        const int32_t* csr_idx, const int32_t* node_lens,
                        int32_t threshold) {
  ReachResult* res = new ReachResult();
  for (int32_t i = 0; i < n_nodes; i++) {
    if (node_lens[i] <= threshold) continue;
    std::set<int32_t> visited;
    std::map<int32_t, int32_t> prev;
    std::deque<int32_t> fr;
    visited.insert(i);
    fr.push_back(i);
    while (!fr.empty()) {
      int32_t x = fr.front();
      fr.pop_front();
      if (node_lens[x] > threshold && x != i) {
        std::vector<int32_t> pp;
        int32_t cur = prev[x];
        while (cur != i) {
          pp.push_back(cur);
          cur = prev[cur];
        }
        res->data.push_back(i);
        res->data.push_back(x);
        res->data.push_back((int32_t)pp.size());
        for (auto it = pp.rbegin(); it != pp.rend(); ++it)
          res->data.push_back(*it);
        continue;
      }
      for (int32_t j = csr_start[x]; j < csr_start[x + 1]; j++) {
        int32_t ni = csr_idx[j];
        if (visited.count(ni)) continue;
        visited.insert(ni);
        prev[ni] = x;
        fr.push_back(ni);
      }
    }
  }
  return res;
}

int64_t reach_result_size(void* handle) {
  return (int64_t)((ReachResult*)handle)->data.size();
}

void reach_result_copy(void* handle, int32_t* out) {
  ReachResult* res = (ReachResult*)handle;
  std::memcpy(out, res->data.data(), res->data.size() * sizeof(int32_t));
}

void reach_free(void* handle) { delete (ReachResult*)handle; }

}  // extern "C"
