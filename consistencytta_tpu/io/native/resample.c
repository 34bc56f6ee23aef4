/* Native polyphase kaiser-sinc resampler for the host-side data pipeline.
 *
 * The training data loader resamples every source clip to 16 kHz
 * (reference tools/torch_tools.py:54-67 via resampy). The JAX-CPU conv
 * path works but burns milliseconds per clip in dispatch; this C kernel
 * applies the same precomputed polyphase filter bank (built in
 * consistencytta_tpu/ops/resample.py) directly over the waveform.
 *
 * out[j] for j = p + new * f (phase p, output frame f):
 *   out[j] = sum_t kernel[p][t] * x_padded[f * orig + t]
 *
 * x_padded carries `width` zeros on the left and `width + orig` on the
 * right, exactly like the JAX path.
 *
 * Build: cc -O3 -shared -fPIC resample.c -o libresample.so  (see loader)
 */

#include <stddef.h>
#include <stdint.h>

void resample_polyphase_f32(
    const float *x_padded,   /* [n_padded] input incl. zero padding */
    int64_t n_padded,
    const float *kernel,     /* [phases, width_k] filter bank */
    int64_t phases,          /* == new_freq (gcd-reduced) */
    int64_t width_k,         /* kernel taps per phase */
    int64_t orig,            /* gcd-reduced original rate (frame stride) */
    float *out,              /* [n_out] */
    int64_t n_out)
{
    for (int64_t j = 0; j < n_out; ++j) {
        int64_t p = j % phases;      /* phase index */
        int64_t f = j / phases;      /* frame index */
        const float *xp = x_padded + f * orig;
        const float *kp = kernel + p * width_k;
        /* stay in range: caller guarantees f*orig + width_k <= n_padded */
        float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
        int64_t t = 0;
        for (; t + 4 <= width_k; t += 4) {
            acc0 += kp[t] * xp[t];
            acc1 += kp[t + 1] * xp[t + 1];
            acc2 += kp[t + 2] * xp[t + 2];
            acc3 += kp[t + 3] * xp[t + 3];
        }
        float acc = acc0 + acc1 + acc2 + acc3;
        for (; t < width_k; ++t) acc += kp[t] * xp[t];
        out[j] = acc;
    }
}

/* mean-center + peak-normalize to 0.5 in one pass pair
 * (reference tools/torch_tools.py:70-71) */
void normalize_wav_f32(float *x, int64_t n)
{
    if (n <= 0) return;
    double mean = 0.0;
    for (int64_t i = 0; i < n; ++i) mean += x[i];
    mean /= (double)n;
    float peak = 0.f;
    for (int64_t i = 0; i < n; ++i) {
        float v = (float)(x[i] - mean);
        x[i] = v;
        float a = v < 0 ? -v : v;
        if (a > peak) peak = a;
    }
    float scale = 1.0f / ((peak + 1e-8f) * 2.0f);
    for (int64_t i = 0; i < n; ++i) x[i] *= scale;
}
