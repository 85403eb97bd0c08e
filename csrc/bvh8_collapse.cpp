// Native BVH8 collapse: binary SAH tree -> sibling-contiguous CBVH table.
//
// Exact port of the Python reference implementation in scene/bvh8.py
// (greedy largest-surface-area expansion, DFS row emission) so the two can
// be oracle-tested for bit equality; the Python loop walks the tree per
// child per expansion step which costs seconds at ~100k triangles
// (BENCH_r01: 4 s scene build, mostly here). This port precomputes subtree
// triangle ranges in O(M) and emits rows in C — sub-10 ms at that size.
//
// The table layout is documented in scene/bvh8.py; the reference's
// structural counterpart is the per-thread binary BVH walk
// (integratorUtilities.cuh:84-186) whose build-time analogue is
// main.cu:133-233.
//
// Build: part of libtpt_native.so (see scene/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int32_t kLeafBit = 1 << 30;

inline float surf_area(const float* b) {
  float dx = std::max(b[3] - b[0], 0.0f);
  float dy = std::max(b[4] - b[1], 0.0f);
  float dz = std::max(b[5] - b[2], 0.0f);
  return 2.0f * (dx * dy + dy * dz + dz * dx);
}

}  // namespace

extern "C" {

// Returns the number of table rows written, or -1 on overflow/error.
// counts_out[0] = num 8-wide nodes, counts_out[1] = num leaf rows.
int tpt_bvh8_collapse(const int32_t* left, const int32_t* right,
                      const int32_t* leaf,   // [M,2] (first,count)
                      const float* bounds,   // [M,6]
                      int num_nodes,
                      const float* tri_pack,        // [T,9]
                      const uint8_t* tri_leaf_mat,  // [T]
                      int num_tris, int leaf_tris, int row_width,
                      int max_rows,
                      float* table,  // [max_rows, row_width] out
                      int32_t* counts_out) {
  const int LT = leaf_tris;
  const int RW = row_width;
  const float kInf = std::numeric_limits<float>::infinity();
  (void)num_tris;

  // subtree triangle ranges in O(M): children are allocated after their
  // parent in both builders, so a reverse index sweep sees children first
  std::vector<int32_t> rlo(num_nodes), rhi(num_nodes);
  for (int i = num_nodes - 1; i >= 0; --i) {
    if (leaf[2 * i + 1] > 0) {
      rlo[i] = leaf[2 * i];
      rhi[i] = leaf[2 * i] + leaf[2 * i + 1];
    } else {
      if (left[i] < 0 || left[i] <= i || right[i] <= i) return -1;
      rlo[i] = rlo[left[i]];
      rhi[i] = rhi[right[i]];
    }
  }

  int cursor = 1;  // row 0 = root node row
  int n_nodes8 = 0, n_leaves8 = 0;
  std::vector<std::pair<int32_t, int32_t>> stack;  // (binary node, table row)
  stack.emplace_back(0, 0);
  int children[8];

  while (!stack.empty()) {
    const auto [b, my_row] = stack.back();
    stack.pop_back();

    // expand b: repeatedly split the expandable child with the largest
    // surface area (expandable = inner binary node spanning > LT tris)
    int nc = 1;
    children[0] = b;
    while (nc < 8) {
      int best = -1;
      float best_a = -1.0f;
      for (int i = 0; i < nc; ++i) {
        const int c = children[i];
        if (leaf[2 * c + 1] == 0 && rhi[c] - rlo[c] > LT) {
          const float a = surf_area(bounds + 6 * c);
          if (a > best_a) {
            best = i;
            best_a = a;
          }
        }
      }
      if (best < 0) break;
      const int c = children[best];
      // children[best] -> (left, right) in place, shifting the tail
      for (int i = nc; i > best + 1; --i) children[i] = children[i - 1];
      children[best] = left[c];
      children[best + 1] = right[c];
      ++nc;
    }

    if (cursor + nc > max_rows || my_row >= max_rows) return -1;
    const int base = cursor;
    cursor += nc;
    ++n_nodes8;

    float* row = table + static_cast<int64_t>(my_row) * RW;
    std::memset(row, 0, sizeof(float) * RW);
    for (int j = 0; j < 48; ++j) row[j] = kInf;  // empty slots: never hit
    int32_t leaf_mask = 0;
    for (int i = 0; i < nc; ++i) {
      const int c = children[i];
      const float* bb = bounds + 6 * c;
      for (int ax = 0; ax < 3; ++ax) {
        row[ax * 8 + i] = bb[ax];
        row[(3 + ax) * 8 + i] = bb[3 + ax];
      }
      const int s = rlo[c], e = rhi[c];
      if (e - s > LT) {
        stack.emplace_back(c, base + i);
      } else {
        leaf_mask |= 1 << i;
        ++n_leaves8;
        float* lrow = table + static_cast<int64_t>(base + i) * RW;
        std::memset(lrow, 0, sizeof(float) * RW);
        int32_t ids[8];
        for (int k = 0; k < LT; ++k) ids[k] = -1;
        for (int k = 0; k < e - s; ++k) {
          std::memcpy(lrow + 9 * k, tri_pack + static_cast<int64_t>(s + k) * 9,
                      9 * sizeof(float));
          int32_t tid = s + k;
          if (tri_leaf_mat[s + k]) tid |= kLeafBit;
          ids[k] = tid;
        }
        std::memcpy(lrow + 9 * LT, ids, LT * sizeof(int32_t));
      }
    }
    std::memcpy(row + 48, &base, sizeof(int32_t));
    std::memcpy(row + 49, &leaf_mask, sizeof(int32_t));
  }

  counts_out[0] = n_nodes8;
  counts_out[1] = n_leaves8;
  return cursor;
}

}  // extern "C"
