/* Native host-side fast paths for the input pipeline.
 *
 * The training host has few cores and the TPU step is ~1 ms, so the python
 * per-example work (ragged->static padding copies, IoU label construction)
 * is the real wall-clock bound of the pipeline.  These are the hot loops,
 * written as a plain C shared library loaded via ctypes (no pybind11 in the
 * image).  Semantics mirror the python implementations exactly; the python
 * side falls back transparently when the library is unavailable.
 *
 * Build: cc -O3 -shared -fPIC fastops.c -o libfastops.so
 */
#include <stdint.h>
#include <string.h>

/* Copy n ragged (len_i, dim) float32 arrays into a zero-initialized
 * (n, max_len, dim) batch and write 1.0 into the (n, max_len) mask for the
 * valid rows.  Rows beyond max_len are clipped. */
void pad_batch_f32(const float **srcs, const int32_t *lens, int32_t n,
                   int32_t max_len, int32_t dim, float *out, float *mask) {
    for (int32_t i = 0; i < n; ++i) {
        int32_t len = lens[i] < max_len ? lens[i] : max_len;
        memcpy(out + (size_t)i * max_len * dim, srcs[i],
               (size_t)len * dim * sizeof(float));
        float *m = mask + (size_t)i * max_len;
        for (int32_t j = 0; j < len; ++j) m[j] = 1.0f;
    }
}

/* Same for a doubly-ragged batch: n sequences of per-item (len_ij, dim)
 * arrays laid out through a flat src pointer table with (n) counts. */
void pad_batch_2d_f32(const float **srcs, const int32_t *outer_lens,
                      const int32_t *inner_lens, int32_t n,
                      int32_t max_outer, int32_t max_inner, int32_t dim,
                      float *out, float *mask) {
    int32_t flat = 0;
    for (int32_t i = 0; i < n; ++i) {
        int32_t n_inner = outer_lens[i];
        for (int32_t j = 0; j < n_inner; ++j, ++flat) {
            if (j >= max_outer) continue;
            int32_t len = inner_lens[flat];
            if (len > max_inner) len = max_inner;
            size_t base = ((size_t)i * max_outer + j);
            memcpy(out + base * max_inner * dim, srcs[flat],
                   (size_t)len * dim * sizeof(float));
            float *m = mask + base * max_inner;
            for (int32_t k = 0; k < len; ++k) m[k] = 1.0f;
        }
    }
}

/* Box IoU with the reference's +1-pixel intersection convention
 * (utils.py:506-522: intersection +1 per side, areas raw): one GT xyxy box
 * against n detected xyxy boxes.  double precision to match python floats
 * bit-for-bit through the 4-decimal label rounding. */
void iou_xyxy_plus1(const double *gt, const double *dets, int32_t n,
                    double *out) {
    double g_area = (gt[2] - gt[0]) * (gt[3] - gt[1]);
    for (int32_t i = 0; i < n; ++i) {
        const double *d = dets + (size_t)i * 4;
        double x1 = gt[0] > d[0] ? gt[0] : d[0];
        double y1 = gt[1] > d[1] ? gt[1] : d[1];
        double x2 = gt[2] < d[2] ? gt[2] : d[2];
        double y2 = gt[3] < d[3] ? gt[3] : d[3];
        double inter = 0.0;
        if (x1 < x2 && y1 < y2) inter = (x2 - x1 + 1.0) * (y2 - y1 + 1.0);
        double d_area = (d[2] - d[0]) * (d[3] - d[1]);
        out[i] = inter / (g_area + d_area - inter);
    }
}

/* Pairwise IoU (N, M) for the detection evaluator: xyxy boxes with the
 * +1-pixel area/intersection convention (boxlist_ops.py:10-48). */
void pairwise_iou_plus1(const double *a, int32_t n, const double *b,
                        int32_t m, double *out) {
    for (int32_t i = 0; i < n; ++i) {
        const double *ba = a + (size_t)i * 4;
        double area_a = (ba[2] - ba[0] + 1.0) * (ba[3] - ba[1] + 1.0);
        for (int32_t j = 0; j < m; ++j) {
            const double *bb = b + (size_t)j * 4;
            double x1 = ba[0] > bb[0] ? ba[0] : bb[0];
            double y1 = ba[1] > bb[1] ? ba[1] : bb[1];
            double x2 = ba[2] < bb[2] ? ba[2] : bb[2];
            double y2 = ba[3] < bb[3] ? ba[3] : bb[3];
            double w = x2 - x1 + 1.0;
            double h = y2 - y1 + 1.0;
            double inter = (w > 0 && h > 0) ? w * h : 0.0;
            double area_b = (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0);
            out[(size_t)i * m + j] = inter / (area_a + area_b - inter);
        }
    }
}
