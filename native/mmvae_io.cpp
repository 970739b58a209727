// Native data-path kernels for the host-side loader.
//
// The reference has no native code at all (SURVEY.md §2) and its Python
// loader is the documented bottleneck (num_workers=0, per-epoch re-tokenize).
// These kernels accelerate the two host hot paths that feed the TPU:
//   * batch gather (fancy-index copy) for arbitrary-dtype rows — the per-step
//     cost of assembling a shuffled batch from the resident dataset;
//   * uint8 -> float32 image normalization fused with the gather;
//   * 27-symbol character one-hot encoding with masks (dataset ingest).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native     (produces libmmvae_io.so)

#include <cstdint>
#include <cstring>
#include <cctype>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Gather rows of a contiguous float32 array: out[i] = src[idx[i]].
void gather_f32(const float* src, const int64_t* idx, int64_t n_rows,
                int64_t row_elems, float* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        std::memcpy(out + i * row_elems, src + idx[i] * row_elems,
                    sizeof(float) * (size_t)row_elems);
    }
}

// Gather rows of a boolean/uint8 array.
void gather_u8(const uint8_t* src, const int64_t* idx, int64_t n_rows,
               int64_t row_elems, uint8_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        std::memcpy(out + i * row_elems, src + idx[i] * row_elems,
                    (size_t)row_elems);
    }
}

// Fused gather + uint8->float32 normalization (x / 255).
void gather_u8_to_f32(const uint8_t* src, const int64_t* idx, int64_t n_rows,
                      int64_t row_elems, float scale, float* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n_rows; ++i) {
        const uint8_t* s = src + idx[i] * row_elems;
        float* o = out + i * row_elems;
        for (int64_t j = 0; j < row_elems; ++j) {
            o[j] = (float)s[j] * scale;
        }
    }
}

// Character one-hot over the fixed 27-symbol alphabet " abc...z".
// texts: n zero-padded strings of byte length text_stride.
// out: (n, seq_len, 27) float32, zeroed by the caller or here.
// masks: (n, seq_len) uint8.
void one_hot_text(const char* texts, const int32_t* lengths, int64_t n,
                  int64_t text_stride, int64_t seq_len, float* out,
                  uint8_t* masks) {
    const int64_t alpha = 27;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const char* t = texts + i * text_stride;
        int64_t len = lengths[i] < seq_len ? lengths[i] : seq_len;
        float* o = out + i * seq_len * alpha;
        uint8_t* m = masks + i * seq_len;
        std::memset(o, 0, sizeof(float) * (size_t)(seq_len * alpha));
        std::memset(m, 0, (size_t)seq_len);
        for (int64_t j = 0; j < len; ++j) {
            char c = (char)std::tolower((unsigned char)t[j]);
            int64_t k = -1;
            if (c == ' ') k = 0;
            else if (c >= 'a' && c <= 'z') k = 1 + (c - 'a');
            if (k >= 0) o[j * alpha + k] = 1.0f;
            m[j] = 1;
        }
    }
}

int mmvae_io_version() { return 1; }

}  // extern "C"
