// Native host runtime: greedy line-segment merging.
//
// The detector's host-side input preparation runs the order-dependent
// greedy merge of broken collinear segments once per (frame, bbox)
// (semantics of detect_3d_cuboid/src/object_3d_util.cpp:300-376 — written
// fresh here). The O(n^2)-per-restart scan is pure pointer-chasing scalar
// work: wrong for the TPU, slow in Python (~100 ms per frame), natural in
// C++ (<1 ms). Exposed through a plain C ABI for ctypes.
//
// Contract (must match ops/lines.py merge_break_lines exactly):
//   repeatedly scan ordered pairs (s1 < s2); the first pair that is
//   (angle-close, endpoint-close, merged-angle-close) merges into s1
//   (leftmost start by x, rightmost end by x), s2 is replaced by the last
//   active row, and the scan restarts; at most 500 restarts. Finally drop
//   segments not longer than edge_length_threshold.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

inline double seg_angle(const double* s) {
  return std::atan2(s[3] - s[1], s[2] - s[0]);
}

inline double undirected_diff(double a, double b) {
  double d = std::fabs(a - b);
  return d < M_PI - d ? d : M_PI - d;
}

inline double dist2(const double* a, const double* b) {
  double dx = a[0] - b[0], dy = a[1] - b[1];
  return dx * dx + dy * dy;
}

}  // namespace

extern "C" {

// lines: n x 4 doubles [x1 y1 x2 y2], modified in place (capacity n rows).
// Returns the number of surviving rows (compacted to the front).
int cube_slam_merge_break_lines(double* lines, int n,
                                double pre_merge_dist_thre,
                                double pre_merge_angle_thre_deg,
                                double edge_length_threshold) {
  const double angle_thre = pre_merge_angle_thre_deg / 180.0 * M_PI;
  const double dist_thre2 = pre_merge_dist_thre * pre_merge_dist_thre;

  std::vector<double> angles(n);
  for (int i = 0; i < n; ++i) angles[i] = seg_angle(lines + 4 * i);

  bool merged_any = true;
  int counter = 0;
  while (merged_any && counter < 500) {
    ++counter;
    merged_any = false;
    for (int s1 = 0; s1 < n - 1 && !merged_any; ++s1) {
      double* a = lines + 4 * s1;
      for (int s2 = s1 + 1; s2 < n; ++s2) {
        double* b = lines + 4 * s2;
        if (undirected_diff(angles[s1], angles[s2]) >= angle_thre) continue;
        if (dist2(a + 2, b) >= dist_thre2 && dist2(b + 2, a) >= dist_thre2)
          continue;
        double start[2], end[2];
        const double* st = (a[0] < b[0]) ? a : b;
        const double* en = (a[2] > b[2]) ? a + 2 : b + 2;
        start[0] = st[0]; start[1] = st[1];
        end[0] = en[0]; end[1] = en[1];
        double merged_angle = std::atan2(end[1] - start[1], end[0] - start[0]);
        if (undirected_diff(angles[s1], merged_angle) >= angle_thre) continue;
        a[0] = start[0]; a[1] = start[1]; a[2] = end[0]; a[3] = end[1];
        angles[s1] = seg_angle(a);
        // fast row removal: move last active row into s2's slot
        std::memcpy(b, lines + 4 * (n - 1), 4 * sizeof(double));
        angles[s2] = angles[n - 1];
        --n;
        merged_any = true;
        break;
      }
    }
  }

  if (edge_length_threshold > 0) {
    int out = 0;
    for (int i = 0; i < n; ++i) {
      const double* s = lines + 4 * i;
      double len = std::hypot(s[2] - s[0], s[3] - s[1]);
      if (len > edge_length_threshold) {
        if (out != i) std::memcpy(lines + 4 * out, s, 4 * sizeof(double));
        ++out;
      }
    }
    n = out;
  }
  return n;
}

}  // extern "C"
