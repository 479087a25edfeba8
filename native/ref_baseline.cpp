// Reference-equivalent CPU frontend measurement for bench.py's baseline.
//
// LEGO-SLAM publishes no throughput numbers (BASELINE.md); round 1 used its
// viewer pacing (8.33 fps, viewer.cpp:76-79) as the denominator, which is
// generous to us.  This program produces an *honest* denominator: it runs
// the same per-frame algorithmic workload as the reference's default build
// on the host CPU, in double precision, over the exact frames bench.py
// times, and reports the achievable frames/s of the reference design.
//
// Workload mirrored (behavior, not code):
//   - tracking: cv::calcOpticalFlowPyrLK, 11x11 window, maxLevel 3, 30
//     iters, eps 0.01, OPTFLOW_USE_INITIAL_FLOW — exactly the call in
//     frontend_lego.cpp:402-406 (the reference's checked-in LK path; its
//     hand-made GN KLT is strictly slower, so this favors the reference).
//   - motion-only pose estimation: 4 outer rounds x 10 LM iterations over
//     <=150 pose-only reprojection edges, Huber (delta^2 = 5.991) dropped at
//     round 2, all double — frontend_g2o.cpp:157-245's loop structure with
//     the analytic 2x6 Jacobian of lego_types.h:147-178.
//   - keyframe ops when inliers < 80 (frontend.h:103): masked GFTT
//     re-detection (GFTTDetector 150/0.01/20, frontend_lego.cpp:16),
//     left->right stereo LK (frontend_lego.cpp:442-447), SVD-DLT
//     triangulation with the sigma-ratio gate (algorithm.h:11-34).
//
// The reference's backend BA runs on its own thread and does not gate frame
// throughput (backend_lego.cpp:38-54); the frontend above is the pacing
// thread, so its fps IS the reference pipeline's compute-bound fps.  (Our
// bench.py number, by contrast, includes the window BA inline — the
// comparison is conservative in the reference's favor on both ends.)
//
// Build+run: see scripts/bench_reference_cpu.py.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/features2d.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/video/tracking.hpp>

namespace {

struct Mat4 {
  double m[16];  // row-major 4x4
};

Mat4 identity4() {
  Mat4 t{};
  t.m[0] = t.m[5] = t.m[10] = t.m[15] = 1.0;
  return t;
}

Mat4 matmul4(const Mat4 &a, const Mat4 &b) {
  Mat4 c{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a.m[i * 4 + k] * b.m[k * 4 + j];
      c.m[i * 4 + j] = s;
    }
  return c;
}

Mat4 inverse_se3(const Mat4 &t) {
  Mat4 r = identity4();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r.m[i * 4 + j] = t.m[j * 4 + i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += r.m[i * 4 + j] * t.m[j * 4 + 3];
    r.m[i * 4 + 3] = -s;
  }
  return r;
}

// SE(3) exponential, tangent ordered (translation, rotation) as Sophus does.
Mat4 se3_exp(const double xi[6]) {
  const double *rho = xi, *phi = xi + 3;
  double th2 = phi[0] * phi[0] + phi[1] * phi[1] + phi[2] * phi[2];
  double th = std::sqrt(th2);
  double A, B, C;  // sin/t, (1-cos)/t^2, (t-sin)/t^3
  if (th < 1e-9) {
    A = 1.0 - th2 / 6.0;
    B = 0.5 - th2 / 24.0;
    C = 1.0 / 6.0 - th2 / 120.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
    C = (1.0 - A) / th2;
  }
  double W[9] = {0, -phi[2], phi[1], phi[2], 0, -phi[0], -phi[1], phi[0], 0};
  double W2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += W[i * 3 + k] * W[k * 3 + j];
      W2[i * 3 + j] = s;
    }
  Mat4 t = identity4();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      t.m[i * 4 + j] = (i == j ? 1.0 : 0.0) + A * W[i * 3 + j] + B * W2[i * 3 + j];
  // V = I + B*W + C*W^2 ; trans = V * rho
  for (int i = 0; i < 3; ++i) {
    double s = rho[i];
    for (int j = 0; j < 3; ++j) s += (B * W[i * 3 + j] + C * W2[i * 3 + j]) * rho[j];
    t.m[i * 4 + 3] = s;
  }
  return t;
}

void transform_point(const Mat4 &t, const double p[3], double out[3]) {
  for (int i = 0; i < 3; ++i)
    out[i] = t.m[i * 4 + 0] * p[0] + t.m[i * 4 + 1] * p[1] + t.m[i * 4 + 2] * p[2] +
             t.m[i * 4 + 3];
}

// Cholesky solve of a 6x6 SPD system (the reduced pose system the reference
// solves with Eigen LDLT, problem.cpp:420).
bool solve6(double H[36], const double b[6], double x[6]) {
  double L[36] = {0};
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = H[i * 6 + j];
      for (int k = 0; k < j; ++k) s -= L[i * 6 + k] * L[j * 6 + k];
      if (i == j) {
        if (s <= 0) return false;
        L[i * 6 + i] = std::sqrt(s);
      } else {
        L[i * 6 + j] = s / L[j * 6 + j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * 6 + k] * y[k];
    y[i] = s / L[i * 6 + i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= L[k * 6 + i] * x[k];
    x[i] = s / L[i * 6 + i];
  }
  return true;
}

struct Camera {
  double fx, fy, cx, cy, baseline;
};

// Motion-only pose LM: the reference's EstimateCurrentPose loop
// (frontend_g2o.cpp:157-245) — 4 outer reclassification rounds around a
// 10-iteration Levenberg solve in double, Huber until round 2.
int estimate_pose(const Camera &cam, const std::vector<cv::Point3d> &pts_w,
                  const std::vector<cv::Point2f> &uv, std::vector<char> &outlier,
                  Mat4 &T_cw) {
  const double chi2_th = 5.991;
  const size_t n = pts_w.size();
  int inliers = 0;
  for (int round = 0; round < 4; ++round) {
    bool robust = round < 2;
    double lambda = 1e-4;
    double last_chi = 1e300;
    for (int it = 0; it < 10; ++it) {
      double H[36] = {0}, b[6] = {0};
      double chi_total = 0;
      for (size_t i = 0; i < n; ++i) {
        if (outlier[i]) continue;
        double p[3] = {pts_w[i].x, pts_w[i].y, pts_w[i].z}, pc[3];
        transform_point(T_cw, p, pc);
        double z = std::max(pc[2], 1e-6);
        double iz = 1.0 / z, iz2 = iz * iz;
        double eu = uv[i].x - (cam.fx * pc[0] * iz + cam.cx);
        double ev = uv[i].y - (cam.fy * pc[1] * iz + cam.cy);
        double chi = eu * eu + ev * ev;
        double w = 1.0;
        if (robust && chi > chi2_th) w = std::sqrt(chi2_th / chi);  // Huber rho'
        chi_total += w * chi;
        // J = -[fx/z 0 -fx x/z2 ; 0 fy/z -fy y/z2] * [I | -[pc]x]   (2x6)
        double ju[6], jv[6];
        ju[0] = -cam.fx * iz;
        ju[1] = 0;
        ju[2] = cam.fx * pc[0] * iz2;
        ju[3] = cam.fx * pc[0] * pc[1] * iz2;
        ju[4] = -cam.fx - cam.fx * pc[0] * pc[0] * iz2;
        ju[5] = cam.fx * pc[1] * iz;
        jv[0] = 0;
        jv[1] = -cam.fy * iz;
        jv[2] = cam.fy * pc[1] * iz2;
        jv[3] = cam.fy + cam.fy * pc[1] * pc[1] * iz2;
        jv[4] = -cam.fy * pc[0] * pc[1] * iz2;
        jv[5] = -cam.fy * pc[0] * iz;
        for (int r = 0; r < 6; ++r) {
          b[r] -= w * (ju[r] * eu + jv[r] * ev);
          for (int c = r; c < 6; ++c) H[r * 6 + c] += w * (ju[r] * ju[c] + jv[r] * jv[c]);
        }
      }
      for (int r = 0; r < 6; ++r)
        for (int c = 0; c < r; ++c) H[r * 6 + c] = H[c * 6 + r];
      for (int r = 0; r < 6; ++r) H[r * 6 + r] += lambda * H[r * 6 + r];
      double dx[6];
      if (!solve6(H, b, dx)) break;
      Mat4 T_new = matmul4(se3_exp(dx), T_cw);
      // LM accept/reject on total chi (g2o OptimizationAlgorithmLevenberg).
      if (chi_total < last_chi) {
        T_cw = T_new;
        last_chi = chi_total;
        lambda = std::max(lambda * 0.5, 1e-10);
      } else {
        lambda = std::min(lambda * 4.0, 1e6);
      }
    }
    inliers = 0;
    for (size_t i = 0; i < n; ++i) {
      double p[3] = {pts_w[i].x, pts_w[i].y, pts_w[i].z}, pc[3];
      transform_point(T_cw, p, pc);
      double z = std::max(pc[2], 1e-6);
      double eu = uv[i].x - (cam.fx * pc[0] / z + cam.cx);
      double ev = uv[i].y - (cam.fy * pc[1] / z + cam.cy);
      bool bad = (eu * eu + ev * ev) > chi2_th;
      outlier[i] = bad;
      if (!bad) ++inliers;
    }
  }
  return inliers;
}

// SVD-DLT two-view triangulation with the sigma-ratio gate (algorithm.h:11-34),
// left camera at T (= T_cw), right offset by the stereo baseline.
bool triangulate(const Camera &cam, const Mat4 &T_cw, const cv::Point2f &ul,
                 const cv::Point2f &ur, cv::Point3d *out) {
  double xl = (ul.x - cam.cx) / cam.fx, yl = (ul.y - cam.cy) / cam.fy;
  double xr = (ur.x - cam.cx) / cam.fx, yr = (ur.y - cam.cy) / cam.fy;
  Mat4 T_rw = T_cw;
  // right camera: x_r = x_l - baseline in the left camera frame
  T_rw.m[3] -= 0;  // keep rotation identical; adjust translation row 0
  T_rw.m[0 * 4 + 3] -= cam.baseline;
  cv::Mat A(4, 4, CV_64F);
  const Mat4 *Ts[2] = {&T_cw, &T_rw};
  double xs[2] = {xl, xr}, ys[2] = {yl, yr};
  for (int v = 0; v < 2; ++v) {
    const double *m = Ts[v]->m;
    for (int c = 0; c < 4; ++c) {
      A.at<double>(2 * v, c) = xs[v] * m[2 * 4 + c] - m[0 * 4 + c];
      A.at<double>(2 * v + 1, c) = ys[v] * m[2 * 4 + c] - m[1 * 4 + c];
    }
  }
  cv::SVD svd(A, cv::SVD::MODIFY_A | cv::SVD::FULL_UV);
  double w3 = svd.w.at<double>(3), w2 = svd.w.at<double>(2);
  if (!(w3 / w2 < 1e-2)) return false;
  double s = svd.vt.at<double>(3, 3);
  if (std::fabs(s) < 1e-12) return false;
  out->x = svd.vt.at<double>(3, 0) / s;
  out->y = svd.vt.at<double>(3, 1) / s;
  out->z = svd.vt.at<double>(3, 2) / s;
  return true;
}

struct Track {
  cv::Point2f uv;
  int lm;  // landmark index, -1 = none
};

double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch()).count();
}

}  // namespace

int main(int argc, char **argv) {
  const char *path = argc > 1 ? argv[1] : "/tmp/legoslam_ref_frames.bin";
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s (run scripts/dump_bench_frames.py)\n", path);
    return 1;
  }
  int32_t hdr[4];
  double camd[5];
  f.read(reinterpret_cast<char *>(hdr), sizeof hdr);
  f.read(reinterpret_cast<char *>(camd), sizeof camd);
  int n = hdr[0], H = hdr[1], W = hdr[2];
  Camera cam{camd[0], camd[1], camd[2], camd[3], camd[4]};
  std::vector<cv::Mat> lefts(n), rights(n);
  for (int i = 0; i < n; ++i) {
    lefts[i].create(H, W, CV_8U);
    rights[i].create(H, W, CV_8U);
    f.read(reinterpret_cast<char *>(lefts[i].data), (size_t)H * W);
    f.read(reinterpret_cast<char *>(rights[i].data), (size_t)H * W);
  }
  std::fprintf(stderr, "ref_baseline: %d frames %dx%d fx=%.1f b=%.2f\n", n, H, W, cam.fx,
               cam.baseline);

  auto gftt = cv::GFTTDetector::create(150, 0.01, 20);  // frontend_lego.cpp:16
  const cv::Size lk_win(11, 11);                         // frontend_lego.cpp:404
  const cv::TermCriteria lk_crit(cv::TermCriteria::COUNT + cv::TermCriteria::EPS, 30, 0.01);

  std::vector<cv::Point3d> landmarks;
  std::vector<Track> tracks;
  Mat4 T_cw = identity4(), T_last = identity4(), rel = identity4();

  auto detect_and_stereo = [&](const cv::Mat &left, const cv::Mat &right) {
    // masked GFTT (frontend_lego.cpp:292-310) + stereo LK + triangulation
    cv::Mat mask(left.size(), CV_8U, cv::Scalar(255));
    for (auto &t : tracks)
      cv::rectangle(mask, t.uv - cv::Point2f(10, 10), t.uv + cv::Point2f(10, 10), 0, -1);
    std::vector<cv::KeyPoint> kps;
    gftt->detect(left, kps, mask);
    if (kps.empty()) return;
    std::vector<cv::Point2f> pl, pr;
    for (auto &k : kps) pl.push_back(k.pt);
    pr = pl;
    std::vector<uchar> st;
    std::vector<float> err;
    cv::calcOpticalFlowPyrLK(left, right, pl, pr, st, err, lk_win, 3, lk_crit,
                             cv::OPTFLOW_USE_INITIAL_FLOW);
    Mat4 T_wc = inverse_se3(T_cw);
    for (size_t i = 0; i < pl.size(); ++i) {
      if (!st[i]) continue;
      cv::Point3d pw;
      if (!triangulate(cam, T_cw, pl[i], pr[i], &pw)) continue;
      double pc[3], pwv[3] = {pw.x, pw.y, pw.z};
      transform_point(T_cw, pwv, pc);
      if (pc[2] < 2.0 || pc[2] > 60.0) continue;  // stereo depth gates
      landmarks.push_back(pw);
      tracks.push_back({pl[i], (int)landmarks.size() - 1});
    }
  };

  // stereo init on frame 0 (StereoInit, frontend_lego.cpp:271-290)
  detect_and_stereo(lefts[0], rights[0]);
  std::fprintf(stderr, "ref_baseline: init %zu landmarks\n", landmarks.size());

  double t_track = 0, t_pose = 0, t_kf = 0;
  int n_kf = 0;
  const int warmup = 4;
  double t0 = 0;
  for (int fi = 1; fi < n; ++fi) {
    if (fi == warmup) t0 = now_ms();
    const cv::Mat &left = lefts[fi];
    // constant-velocity prior (frontend_lego.cpp:50)
    T_cw = matmul4(rel, T_last);

    // --- track last frame (LK, exact reference call) ---
    double ta = now_ms();
    std::vector<cv::Point2f> p0, p1;
    for (auto &t : tracks) p0.push_back(t.uv);
    p1 = p0;
    std::vector<uchar> st;
    std::vector<float> err;
    cv::calcOpticalFlowPyrLK(lefts[fi - 1], left, p0, p1, st, err, lk_win, 3, lk_crit,
                             cv::OPTFLOW_USE_INITIAL_FLOW);
    std::vector<Track> kept;
    std::vector<cv::Point3d> pts;
    std::vector<cv::Point2f> uv;
    for (size_t i = 0; i < tracks.size(); ++i) {
      if (!st[i] || tracks[i].lm < 0) continue;
      kept.push_back({p1[i], tracks[i].lm});
      pts.push_back(landmarks[tracks[i].lm]);
      uv.push_back(p1[i]);
    }
    tracks = kept;
    double tb = now_ms();
    t_track += tb - ta;

    // --- motion-only pose LM ---
    std::vector<char> outlier(pts.size(), 0);
    int inliers = estimate_pose(cam, pts, uv, outlier, T_cw);
    // drop outlier associations (frontend_g2o.cpp:239-244)
    std::vector<Track> clean;
    for (size_t i = 0; i < tracks.size(); ++i)
      if (!outlier[i]) clean.push_back(tracks[i]);
    tracks = clean;
    double tc = now_ms();
    t_pose += tc - tb;

    // --- keyframe ops at the reference cadence (inliers < 80) ---
    if (inliers < 80) {
      detect_and_stereo(left, rights[fi]);
      ++n_kf;
    }
    t_kf += now_ms() - tc;

    rel = matmul4(T_cw, inverse_se3(T_last));
    T_last = T_cw;
  }
  double total_ms = now_ms() - t0;
  int timed = n - warmup;  // t0 set at fi == warmup; frames fi = warmup..n-1
  double fps = 1000.0 * timed / total_ms;
  std::fprintf(stderr,
               "ref_baseline: %d timed frames, %.1f ms total, %d keyframes; "
               "track %.2f ms/f, pose %.2f ms/f, kf-amortized %.2f ms/f\n",
               timed, total_ms, n_kf, t_track / (n - 1), t_pose / (n - 1), t_kf / (n - 1));
  std::printf(
      "{\"metric\": \"reference_cpu_frames_per_second\", \"value\": %.3f, "
      "\"unit\": \"frames/s\", \"tracks\": %zu, \"keyframes\": %d}\n",
      fps, tracks.size(), n_kf);
  return 0;
}
