// treekit: native host-side runtime for HierDiff-TPU.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native runtime
// around it — the host-side hot loops that sit between RDKit chemistry and
// the device: junction-tree order building (DFS/BFS programs), search
// adjacency construction, and dense batch packing for the training iterators
// and the autoregressive beam-search fleet. These run per-sample per-step in
// Python in the first implementation (data/orders.py, data/denoise.py,
// sampling/ar.py); at production batch sizes they become the host bottleneck
// that stalls the device.
//
// Exposed as a C ABI consumed via ctypes (hierdiff_tpu/runtime/__init__.py).
// All buffers are caller-allocated numpy arrays; no memory crosses the
// boundary in native ownership.
//
// Build: make -C hierdiff_tpu/runtime   (produces libtreekit.so)

#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// DFS order with explicit forward/backtrack path over an adjacency matrix.
// Mirrors data_utils/data_diffuse.py:83-96 (recursive preorder, neighbor
// order = ascending index, matching numpy nonzero order used by the
// reference's graph construction).
// ---------------------------------------------------------------------------

static void dfs_rec(const double* adj, int n, int node,
                    std::vector<uint8_t>& visited,
                    std::vector<int32_t>& order_node,
                    std::vector<int32_t>& order_depth,
                    std::vector<int32_t>& path_a,
                    std::vector<int32_t>& path_b) {
  order_node.push_back(node);
  order_depth.push_back((int32_t)path_a.size());
  visited[node] = 1;
  for (int next = 0; next < n; ++next) {
    if (adj[(size_t)node * n + next] != 0.0 && !visited[next]) {
      visited[next] = 1;
      path_a.push_back(node);
      path_b.push_back(next);
      dfs_rec(adj, n, next, visited, order_node, order_depth, path_a, path_b);
      path_a.push_back(next);
      path_b.push_back(node);
    }
  }
}

// dfs_bidirection (data_utils/MPNN_pattern.py:15-42): pick DFS step
// `sample_idx` (or uniform in [0, n) when sample_idx < 0 using `seed`).
// Outputs: undiscovered mask (n), search_ind, last_ind (-1 at root step).
// Returns the chosen step index.
int32_t tk_dfs_bidirection(const double* adj, int32_t n, int32_t sample_idx,
                           uint64_t seed, uint8_t* undiscovered_mask,
                           int32_t* search_ind, int32_t* last_ind) {
  std::vector<uint8_t> visited(n, 0);
  std::vector<int32_t> order_node, order_depth, path_a, path_b;
  order_node.reserve(n);
  dfs_rec(adj, n, 0, visited, order_node, order_depth, path_a, path_b);

  int32_t idx = sample_idx;
  if (idx < 0) {
    std::mt19937_64 rng(seed);
    std::uniform_int_distribution<int32_t> dist(0, (int32_t)order_node.size() - 1);
    idx = dist(rng);
  }
  std::memset(undiscovered_mask, 0, n);
  if (idx == 0) {
    for (int i = 0; i < n; ++i) undiscovered_mask[i] = 1;
    *search_ind = 0;
    *last_ind = -1;
    return idx;
  }
  int32_t s = order_node[idx];
  int32_t depth = order_depth[idx];
  // last_ind = node whose order entry precedes the first entry at `depth`
  int32_t first_at_depth = 0;
  for (size_t i = 0; i < order_depth.size(); ++i) {
    if (order_depth[i] == depth) { first_at_depth = (int32_t)i; break; }
  }
  *last_ind = order_node[first_at_depth - 1];
  *search_ind = s;
  // mask EXCLUDES the search node, exactly like the Python/reference
  // dfs_bidirection (MPNN_pattern.py:15-42, data/orders.py) — consumers add
  // the search node themselves where the contract needs it
  for (size_t i = 0; i < order_node.size(); ++i) {
    if (order_depth[i] > depth) undiscovered_mask[order_node[i]] = 1;
  }
  return idx;
}

// Search adjacency (MPNN_pattern.py:52-60): zero rows/cols of undiscovered
// nodes and the search node; org out param gets the result; search adds the
// last<->search edge.
void tk_make_search_adj(const double* adj, int32_t n,
                        const uint8_t* undiscovered_mask, int32_t search_ind,
                        int32_t last_ind, float* org, float* search) {
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      bool kill = undiscovered_mask[i] || undiscovered_mask[j] ||
                  i == search_ind || j == search_ind;
      float v = kill ? 0.f : (float)adj[(size_t)i * n + j];
      org[(size_t)i * n + j] = v;
      search[(size_t)i * n + j] = v;
    }
  }
  if (last_ind >= 0) {
    search[(size_t)last_ind * n + search_ind] = 1.f;
    search[(size_t)search_ind * n + last_ind] = 1.f;
  }
}

// ---------------------------------------------------------------------------
// Dense batch packing for the edge-denoise training iterator: for a batch of
// trees (flattened inputs), run DFS-step sampling + search adjacency + all
// dense fields in one call. Mirrors data/denoise.py:make_denoise_batch.
//
// Inputs per tree i (offsets via tree_offsets, node counts via tree_sizes):
//   feats   (sum_n, F) float32
//   pos     (sum_n, 3) float32
//   adj     (sum_n_sq) float64  (concatenated n_i x n_i blocks)
//   wids    (sum_n)    int64
// Outputs (B = n_trees, N = max_n): dense padded arrays, see Python side.
// ---------------------------------------------------------------------------

void tk_pack_denoise_batch(
    int32_t n_trees, int32_t max_n, int32_t feat_dim, uint64_t seed,
    const int32_t* tree_sizes, const int64_t* node_offsets,
    const int64_t* adj_offsets, const float* feats_in, const float* pos_in,
    const double* adj_in, const int64_t* wids_in, int32_t undiscovered_token,
    float* feats, float* pos, int32_t* discovered, int32_t* vocab_idx,
    float* node_mask, float* edge_mask, float* search_adj, float* focal_label,
    float* undiscovered, int32_t* predict_idx, int32_t* last_ind,
    int32_t* label) {
  std::vector<uint8_t> umask;
  std::vector<float> org, search;
  for (int b = 0; b < n_trees; ++b) {
    const int n = tree_sizes[b];
    const int64_t no = node_offsets[b];
    const int64_t ao = adj_offsets[b];
    const double* adj = adj_in + ao;
    umask.assign(n, 0);
    org.assign((size_t)n * n, 0.f);
    search.assign((size_t)n * n, 0.f);

    int32_t s_ind, l_ind;
    tk_dfs_bidirection(adj, n, -1, seed + (uint64_t)b * 0x9E3779B97F4A7C15ULL,
                       umask.data(), &s_ind, &l_ind);
    tk_make_search_adj(adj, n, umask.data(), s_ind, l_ind, org.data(), search.data());

    float* fb = feats + (size_t)b * max_n * feat_dim;
    float* pb = pos + (size_t)b * max_n * 3;
    for (int i = 0; i < n; ++i) {
      std::memcpy(fb + (size_t)i * feat_dim, feats_in + (no + i) * feat_dim,
                  sizeof(float) * feat_dim);
      std::memcpy(pb + (size_t)i * 3, pos_in + (no + i) * 3, sizeof(float) * 3);
      node_mask[(size_t)b * max_n + i] = 1.f;
    }
    for (int i = 0; i < n; ++i) {
      double org_row = 0.0, full_row = 0.0;
      for (int j = 0; j < n; ++j) {
        float ov = org[(size_t)i * n + j];
        search_adj[((size_t)b * max_n + i) * max_n + j] = ov;
        edge_mask[((size_t)b * max_n + i) * max_n + j] = (i == j) ? 0.f : 1.f;
        org_row += ov;
        full_row += adj[(size_t)i * n + j];
      }
      bool disc = org_row > 0.0;
      discovered[(size_t)b * max_n + i] = disc ? 1 : 0;
      bool val_miss = (full_row - org_row) != 0.0;
      focal_label[(size_t)b * max_n + i] = (disc && val_miss) ? 1.f : 0.f;
      // the batch channel INCLUDES the search node (its type is the label;
      // it must be in the CE support and carry the undiscovered token —
      // MPNN_pattern.py:68-79, data/denoise.py:make_denoise_example)
      bool und = umask[i] || i == s_ind;
      undiscovered[(size_t)b * max_n + i] = und ? 1.f : 0.f;
      vocab_idx[(size_t)b * max_n + i] =
          und ? undiscovered_token : (int32_t)wids_in[no + i];
    }
    for (int i = n; i < max_n; ++i)
      vocab_idx[(size_t)b * max_n + i] = undiscovered_token;
    predict_idx[b] = s_ind;
    last_ind[b] = l_ind;
    label[b] = (int32_t)wids_in[no + s_ind];
  }
}

// ---------------------------------------------------------------------------
// Fleet packing for the AR beam search (sampling/ar.py:_batch_step): pad K
// tree states into one dense bucket. States are given as flattened arrays.
// ---------------------------------------------------------------------------

void tk_pack_ar_fleet(
    int32_t n_states, int32_t max_n, int32_t feat_dim,
    const int32_t* state_sizes, const int64_t* node_offsets,
    const float* feats_in, const float* pos_in, const float* adj_in,
    const int64_t* adj_offsets, const int64_t* wids_in,
    int32_t undiscovered_token, float* feats, float* pos, float* adj,
    int32_t* vocab, int32_t* disc, float* nmask) {
  for (int b = 0; b < n_states; ++b) {
    const int n = state_sizes[b];
    const int64_t no = node_offsets[b];
    const int64_t ao = adj_offsets[b];
    float* fb = feats + (size_t)b * max_n * feat_dim;
    float* pb = pos + (size_t)b * max_n * 3;
    float* ab = adj + (size_t)b * max_n * max_n;
    for (int i = 0; i < n; ++i) {
      std::memcpy(fb + (size_t)i * feat_dim, feats_in + (no + i) * feat_dim,
                  sizeof(float) * feat_dim);
      std::memcpy(pb + (size_t)i * 3, pos_in + (no + i) * 3, sizeof(float) * 3);
      std::memcpy(ab + (size_t)i * max_n, adj_in + ao + (size_t)i * n,
                  sizeof(float) * n);
      nmask[(size_t)b * max_n + i] = 1.f;
      int64_t w = wids_in[no + i];
      vocab[(size_t)b * max_n + i] = w >= 0 ? (int32_t)w : undiscovered_token;
      disc[(size_t)b * max_n + i] = w >= 0 ? 1 : 0;
    }
    for (int i = n; i < max_n; ++i)
      vocab[(size_t)b * max_n + i] = undiscovered_token;
  }
}

}  // extern "C"
