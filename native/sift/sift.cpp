// Native SIFT feature extractor (classic Lowe pipeline), C ABI for ctypes.
//
// The reference framework depends on OpenCV's C++ SIFT for its RootSIFT
// pipeline (components/extractors.py:27-47, dump/dump_megadepth.py:92).
// impx uses OpenCV when present and this implementation as the first-class
// native fallback: Gaussian/DoG pyramid, 3x3x3 extrema with subpixel
// refinement, contrast + edge rejection, 36-bin orientation assignment,
// 4x4x8 descriptor with trilinear binning.
//
// Build: make -C native/sift  (produces libimpx_sift.so)

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Image {
  int h = 0, w = 0;
  std::vector<float> data;
  Image() = default;
  Image(int h_, int w_) : h(h_), w(w_), data((size_t)h_ * w_, 0.f) {}
  float& at(int y, int x) { return data[(size_t)y * w + x]; }
  float at(int y, int x) const { return data[(size_t)y * w + x]; }
};

Image gaussian_blur(const Image& src, float sigma) {
  int radius = std::max(1, (int)std::ceil(3.0f * sigma));
  std::vector<float> kernel(2 * radius + 1);
  float sum = 0.f;
  for (int i = -radius; i <= radius; ++i) {
    kernel[i + radius] = std::exp(-0.5f * i * i / (sigma * sigma));
    sum += kernel[i + radius];
  }
  for (auto& k : kernel) k /= sum;

  Image tmp(src.h, src.w), dst(src.h, src.w);
  // horizontal
  for (int y = 0; y < src.h; ++y) {
    for (int x = 0; x < src.w; ++x) {
      float acc = 0.f;
      for (int i = -radius; i <= radius; ++i) {
        int xx = std::clamp(x + i, 0, src.w - 1);
        acc += kernel[i + radius] * src.at(y, xx);
      }
      tmp.at(y, x) = acc;
    }
  }
  // vertical
  for (int y = 0; y < src.h; ++y) {
    for (int x = 0; x < src.w; ++x) {
      float acc = 0.f;
      for (int i = -radius; i <= radius; ++i) {
        int yy = std::clamp(y + i, 0, src.h - 1);
        acc += kernel[i + radius] * tmp.at(yy, x);
      }
      dst.at(y, x) = acc;
    }
  }
  return dst;
}

Image downsample2(const Image& src) {
  Image dst(src.h / 2, src.w / 2);
  for (int y = 0; y < dst.h; ++y)
    for (int x = 0; x < dst.w; ++x) dst.at(y, x) = src.at(2 * y, 2 * x);
  return dst;
}

Image upsample2(const Image& src) {
  Image dst(src.h * 2, src.w * 2);
  for (int y = 0; y < dst.h; ++y) {
    float fy = 0.5f * y;
    int y0 = std::min((int)fy, src.h - 1), y1 = std::min(y0 + 1, src.h - 1);
    float wy = fy - y0;
    for (int x = 0; x < dst.w; ++x) {
      float fx = 0.5f * x;
      int x0 = std::min((int)fx, src.w - 1), x1 = std::min(x0 + 1, src.w - 1);
      float wx = fx - x0;
      dst.at(y, x) = (1 - wy) * ((1 - wx) * src.at(y0, x0) + wx * src.at(y0, x1)) +
                     wy * ((1 - wx) * src.at(y1, x0) + wx * src.at(y1, x1));
    }
  }
  return dst;
}

struct Keypoint {
  float x, y;        // coordinates in the ORIGINAL image
  float sigma;       // absolute scale
  float response;
  float angle;       // radians
  int octave, layer;
  float ox, oy;      // coordinates within the octave image
};

constexpr int kNumScales = 3;               // intervals per octave
constexpr float kSigma0 = 1.6f;
constexpr float kContrastTh = 0.04f;
constexpr float kEdgeR = 10.0f;

bool refine_extremum(const std::vector<Image>& dog, int layer, int y, int x,
                     float* dx_out, float* dy_out, float* ds_out, float* val) {
  const Image& c = dog[layer];
  const Image& p = dog[layer - 1];
  const Image& n = dog[layer + 1];
  float Dx = 0.5f * (c.at(y, x + 1) - c.at(y, x - 1));
  float Dy = 0.5f * (c.at(y + 1, x) - c.at(y - 1, x));
  float Ds = 0.5f * (n.at(y, x) - p.at(y, x));
  float Dxx = c.at(y, x + 1) + c.at(y, x - 1) - 2 * c.at(y, x);
  float Dyy = c.at(y + 1, x) + c.at(y - 1, x) - 2 * c.at(y, x);
  float Dss = n.at(y, x) + p.at(y, x) - 2 * c.at(y, x);
  float Dxy = 0.25f * (c.at(y + 1, x + 1) - c.at(y + 1, x - 1) -
                       c.at(y - 1, x + 1) + c.at(y - 1, x - 1));
  float Dxs = 0.25f * (n.at(y, x + 1) - n.at(y, x - 1) -
                       p.at(y, x + 1) + p.at(y, x - 1));
  float Dys = 0.25f * (n.at(y + 1, x) - n.at(y - 1, x) -
                       p.at(y + 1, x) + p.at(y - 1, x));
  // solve H * delta = -grad (3x3 via Cramer)
  float H[3][3] = {{Dxx, Dxy, Dxs}, {Dxy, Dyy, Dys}, {Dxs, Dys, Dss}};
  float g[3] = {Dx, Dy, Ds};
  float det = H[0][0] * (H[1][1] * H[2][2] - H[1][2] * H[2][1]) -
              H[0][1] * (H[1][0] * H[2][2] - H[1][2] * H[2][0]) +
              H[0][2] * (H[1][0] * H[2][1] - H[1][1] * H[2][0]);
  if (std::fabs(det) < 1e-12f) return false;
  auto solve = [&](int col) {
    float M[3][3];
    std::memcpy(M, H, sizeof(M));
    for (int r = 0; r < 3; ++r) M[r][col] = -g[r];
    return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1]) -
            M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0]) +
            M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0])) / det;
  };
  float dx = solve(0), dy = solve(1), ds = solve(2);
  if (std::fabs(dx) > 1.5f || std::fabs(dy) > 1.5f || std::fabs(ds) > 1.5f) return false;
  *val = c.at(y, x) + 0.5f * (Dx * dx + Dy * dy + Ds * ds);
  // edge rejection on the 2x2 spatial Hessian
  float tr = Dxx + Dyy;
  float det2 = Dxx * Dyy - Dxy * Dxy;
  if (det2 <= 0) return false;
  if (tr * tr * kEdgeR >= (kEdgeR + 1) * (kEdgeR + 1) * det2) return false;
  *dx_out = dx;
  *dy_out = dy;
  *ds_out = ds;
  return true;
}

void compute_orientations(const Image& img, float x, float y, float sigma,
                          std::vector<float>* angles) {
  constexpr int kBins = 36;
  float hist[kBins] = {0};
  float sig = 1.5f * sigma;
  int radius = (int)std::round(3.0f * sig);
  int cx = (int)std::round(x), cy = (int)std::round(y);
  for (int dy = -radius; dy <= radius; ++dy) {
    for (int dx = -radius; dx <= radius; ++dx) {
      int px = cx + dx, py = cy + dy;
      if (px < 1 || px >= img.w - 1 || py < 1 || py >= img.h - 1) continue;
      float gx = img.at(py, px + 1) - img.at(py, px - 1);
      float gy = img.at(py + 1, px) - img.at(py - 1, px);
      float mag = std::sqrt(gx * gx + gy * gy);
      float w = std::exp(-0.5f * (dx * dx + dy * dy) / (sig * sig));
      float ang = std::atan2(gy, gx);
      int bin = (int)std::floor((ang + (float)M_PI) / (2 * (float)M_PI) * kBins);
      bin = std::clamp(bin, 0, kBins - 1);
      hist[bin] += w * mag;
    }
  }
  // smooth the histogram twice
  for (int pass = 0; pass < 2; ++pass) {
    float tmp[kBins];
    for (int i = 0; i < kBins; ++i)
      tmp[i] = 0.25f * hist[(i + kBins - 1) % kBins] + 0.5f * hist[i] +
               0.25f * hist[(i + 1) % kBins];
    std::memcpy(hist, tmp, sizeof(hist));
  }
  float peak = *std::max_element(hist, hist + kBins);
  if (peak <= 0) {
    angles->push_back(0.f);
    return;
  }
  for (int i = 0; i < kBins; ++i) {
    float l = hist[(i + kBins - 1) % kBins], r = hist[(i + 1) % kBins];
    if (hist[i] > l && hist[i] > r && hist[i] >= 0.8f * peak) {
      float interp = 0.5f * (l - r) / (l - 2 * hist[i] + r + 1e-12f);
      float ang = (i + 0.5f + interp) / kBins * 2 * (float)M_PI - (float)M_PI;
      angles->push_back(ang);
    }
  }
  if (angles->empty()) angles->push_back(0.f);
}

void compute_descriptor(const Image& img, float x, float y, float sigma,
                        float angle, float* desc) {
  constexpr int kD = 4, kB = 8;
  float hist[kD][kD][kB] = {{{0}}};
  float cos_a = std::cos(angle), sin_a = std::sin(angle);
  float bin_width = 3.0f * sigma;
  int radius = (int)std::round(bin_width * (kD + 1) * 0.5f * std::sqrt(2.0f));
  int cx = (int)std::round(x), cy = (int)std::round(y);
  float sig = 0.5f * kD;
  for (int dy = -radius; dy <= radius; ++dy) {
    for (int dx = -radius; dx <= radius; ++dx) {
      int px = cx + dx, py = cy + dy;
      if (px < 1 || px >= img.w - 1 || py < 1 || py >= img.h - 1) continue;
      // rotate into the keypoint frame
      float rx = (cos_a * dx + sin_a * dy) / bin_width;
      float ry = (-sin_a * dx + cos_a * dy) / bin_width;
      float cbin = rx + kD / 2.0f - 0.5f;
      float rbin = ry + kD / 2.0f - 0.5f;
      if (cbin <= -1 || cbin >= kD || rbin <= -1 || rbin >= kD) continue;
      float gx = img.at(py, px + 1) - img.at(py, px - 1);
      float gy = img.at(py + 1, px) - img.at(py - 1, px);
      float mag = std::sqrt(gx * gx + gy * gy);
      float w = std::exp(-0.5f * (rx * rx + ry * ry) / (sig * sig));
      float ang = std::atan2(gy, gx) - angle;
      while (ang < 0) ang += 2 * (float)M_PI;
      while (ang >= 2 * (float)M_PI) ang -= 2 * (float)M_PI;
      float obin = ang / (2 * (float)M_PI) * kB;
      int r0 = (int)std::floor(rbin), c0 = (int)std::floor(cbin),
          o0 = (int)std::floor(obin) % kB;
      float fr = rbin - r0, fc = cbin - c0, fo = obin - std::floor(obin);
      for (int ir = 0; ir < 2; ++ir) {
        int rr = r0 + ir;
        if (rr < 0 || rr >= kD) continue;
        float wr = w * mag * (ir ? fr : 1 - fr);
        for (int ic = 0; ic < 2; ++ic) {
          int cc = c0 + ic;
          if (cc < 0 || cc >= kD) continue;
          float wc = wr * (ic ? fc : 1 - fc);
          for (int io = 0; io < 2; ++io) {
            int oo = (o0 + io) % kB;
            hist[rr][cc][oo] += wc * (io ? fo : 1 - fo);
          }
        }
      }
    }
  }
  float* h = &hist[0][0][0];
  float norm = 0;
  for (int i = 0; i < 128; ++i) norm += h[i] * h[i];
  norm = std::sqrt(norm) + 1e-12f;
  for (int i = 0; i < 128; ++i) h[i] = std::min(h[i] / norm, 0.2f);
  norm = 0;
  for (int i = 0; i < 128; ++i) norm += h[i] * h[i];
  norm = std::sqrt(norm) + 1e-12f;
  for (int i = 0; i < 128; ++i) desc[i] = h[i] / norm * 512.0f;
}

}  // namespace

extern "C" int sift_extract(const unsigned char* img_u8, int h, int w,
                            int max_kpts, float contrast_th,
                            float* out_kpts, float* out_desc) {
  if (h < 16 || w < 16 || max_kpts <= 0) return 0;
  float cth = contrast_th > 0 ? contrast_th : kContrastTh;

  Image base_raw(h, w);
  for (int i = 0; i < h * w; ++i) base_raw.data[i] = img_u8[i] / 255.0f;
  // double the base image (Lowe): assumed camera blur 0.5 -> 1.0 after 2x
  Image base = upsample2(base_raw);
  float sigma_diff = std::sqrt(std::max(kSigma0 * kSigma0 - 1.0f, 0.01f));
  base = gaussian_blur(base, sigma_diff);

  int n_octaves = std::max(
      1, (int)(std::log2((double)std::min(base.h, base.w)) - 3.0));
  n_octaves = std::min(n_octaves, 6);

  float k = std::pow(2.0f, 1.0f / kNumScales);
  std::vector<Keypoint> kps;

  Image oct_base = std::move(base);
  for (int o = 0; o < n_octaves; ++o) {
    // Gaussian stack: kNumScales + 3 images
    std::vector<Image> gauss;
    gauss.push_back(oct_base);
    float sigma_prev = kSigma0;
    for (int s = 1; s < kNumScales + 3; ++s) {
      float sigma_total = kSigma0 * std::pow(k, (float)s);
      float sig = std::sqrt(sigma_total * sigma_total - sigma_prev * sigma_prev);
      gauss.push_back(gaussian_blur(gauss.back(), sig));
      sigma_prev = sigma_total;
    }
    std::vector<Image> dog;
    for (int s = 0; s < kNumScales + 2; ++s) {
      Image d(gauss[s].h, gauss[s].w);
      for (size_t i = 0; i < d.data.size(); ++i)
        d.data[i] = gauss[s + 1].data[i] - gauss[s].data[i];
      dog.push_back(std::move(d));
    }

    float pre_th = 0.5f * cth / kNumScales;
    for (int s = 1; s <= kNumScales; ++s) {
      const Image& c = dog[s];
      for (int y = 1; y < c.h - 1; ++y) {
        for (int x = 1; x < c.w - 1; ++x) {
          float v = c.at(y, x);
          if (std::fabs(v) < pre_th) continue;
          bool is_max = true, is_min = true;
          for (int ds = -1; ds <= 1 && (is_max || is_min); ++ds)
            for (int dy = -1; dy <= 1; ++dy)
              for (int dx = -1; dx <= 1; ++dx) {
                if (!ds && !dy && !dx) continue;
                float nv = dog[s + ds].at(y + dy, x + dx);
                if (nv >= v) is_max = false;
                if (nv <= v) is_min = false;
              }
          if (!is_max && !is_min) continue;
          float ddx, ddy, dds, val;
          if (!refine_extremum(dog, s, y, x, &ddx, &ddy, &dds, &val)) continue;
          if (std::fabs(val) < cth / kNumScales) continue;

          Keypoint kp;
          kp.octave = o;
          kp.layer = s;
          kp.ox = x + ddx;
          kp.oy = y + ddy;
          float scale = std::pow(2.0f, (float)o) * 0.5f;  // /2 for the 2x base
          kp.x = kp.ox * scale;
          kp.y = kp.oy * scale;
          kp.sigma = kSigma0 * std::pow(k, s + dds) * scale * 2.0f;
          kp.response = std::fabs(val);
          // orientations (may split into several keypoints)
          std::vector<float> angles;
          const Image& gimg = gauss[s];
          compute_orientations(gimg, kp.ox, kp.oy,
                               kSigma0 * std::pow(k, s + dds), &angles);
          for (float a : angles) {
            kp.angle = a;
            kps.push_back(kp);
          }
        }
      }
    }

    if (o + 1 < n_octaves) {
      // next octave base: the gaussian at 2*sigma0 downsampled
      oct_base = downsample2(gauss[kNumScales]);
      if (oct_base.h < 16 || oct_base.w < 16) break;
    }
  }

  // top-k by response
  std::sort(kps.begin(), kps.end(),
            [](const Keypoint& a, const Keypoint& b) { return a.response > b.response; });
  int n = std::min((int)kps.size(), max_kpts);

  // recompute per-octave gaussians for descriptors would be expensive;
  // instead compute descriptors from a per-octave blurred image rebuilt on
  // demand (cache by (octave, layer)).
  std::vector<std::vector<Image>> cache(n_octaves);
  Image b2 = upsample2(base_raw);
  b2 = gaussian_blur(b2, sigma_diff);
  {
    Image ob = std::move(b2);
    for (int o = 0; o < n_octaves; ++o) {
      std::vector<Image> gauss;
      gauss.push_back(ob);
      float sigma_prev = kSigma0;
      for (int s = 1; s < kNumScales + 3; ++s) {
        float sigma_total = kSigma0 * std::pow(k, (float)s);
        float sig = std::sqrt(sigma_total * sigma_total - sigma_prev * sigma_prev);
        gauss.push_back(gaussian_blur(gauss.back(), sig));
        sigma_prev = sigma_total;
      }
      if (o + 1 < n_octaves) {
        ob = downsample2(gauss[kNumScales]);
        cache[o] = std::move(gauss);
        if (ob.h < 16 || ob.w < 16) { n_octaves = o + 1; break; }
      } else {
        cache[o] = std::move(gauss);
      }
    }
  }

  for (int i = 0; i < n; ++i) {
    const Keypoint& kp = kps[i];
    out_kpts[i * 4 + 0] = kp.x;
    out_kpts[i * 4 + 1] = kp.y;
    out_kpts[i * 4 + 2] = kp.sigma;
    out_kpts[i * 4 + 3] = kp.response;
    const Image& gimg = cache[kp.octave][kp.layer];
    compute_descriptor(gimg, kp.ox, kp.oy,
                       kSigma0 * std::pow(k, (float)kp.layer), kp.angle,
                       out_desc + (size_t)i * 128);
  }
  return n;
}
