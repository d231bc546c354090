/* Minimal dav1d decoder shim for conformance testing.
 *
 * We declare the public dav1d 6.x ABI locally (no dev headers on this
 * system; layouts match dav1d/dav1d.h, picture.h, data.h for API major 6).
 * Exposes one function, dav1d_shim_decode(), returning planar YUV.
 *
 * Build: tools/build_native.sh (gcc -shared -ldav1d)
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>
#include <stdio.h>

/* ---- dav1d ABI declarations (subset) ---- */

typedef struct Dav1dRef Dav1dRef;

typedef struct Dav1dUserData {
    const uint8_t *data;
    Dav1dRef *ref;
} Dav1dUserData;

typedef struct Dav1dDataProps {
    int64_t timestamp;
    int64_t duration;
    int64_t offset;
    size_t size;
    Dav1dUserData user_data;
} Dav1dDataProps;

typedef struct Dav1dData {
    const uint8_t *data;
    size_t sz;
    Dav1dRef *ref;
    Dav1dDataProps m;
} Dav1dData;

typedef struct Dav1dPictureParameters {
    int w;
    int h;
    int layout; /* enum Dav1dPixelLayout */
    int bpc;
} Dav1dPictureParameters;

typedef struct Dav1dPicture {
    void *seq_hdr;
    void *frame_hdr;
    void *data[3];
    ptrdiff_t stride[2];
    Dav1dPictureParameters p;
    Dav1dDataProps m;
    void *content_light;
    void *mastering_display;
    void *itut_t35;
    size_t n_itut_t35;
    uintptr_t reserved[4];
    void *frame_hdr_ref;
    void *seq_hdr_ref;
    void *content_light_ref;
    void *mastering_display_ref;
    void *itut_t35_ref;
    uintptr_t reserved_ref[4];
    Dav1dRef *ref;
    void *allocator_data;
} Dav1dPicture;

typedef struct Dav1dPicAllocator {
    void *cookie;
    int (*alloc_picture_callback)(Dav1dPicture *, void *);
    void (*release_picture_callback)(Dav1dPicture *, void *);
} Dav1dPicAllocator;

typedef struct Dav1dLogger {
    void *cookie;
    void (*callback)(void *, const char *, va_list);
} Dav1dLogger;

typedef struct Dav1dSettings {
    int n_threads;
    int max_frame_delay;
    int apply_grain;
    int operating_point;
    int all_layers;
    unsigned frame_size_limit;
    Dav1dPicAllocator allocator;
    Dav1dLogger logger;
    int strict_std_compliance;
    int output_invisible_frames;
    int inloop_filters; /* enum */
    int decode_frame_type; /* enum (API >= 6.8); harmless tail otherwise */
    uint8_t reserved[16];
} Dav1dSettings;

typedef struct Dav1dContext Dav1dContext;

extern const char *dav1d_version(void);
extern void dav1d_default_settings(Dav1dSettings *s);
extern int dav1d_open(Dav1dContext **c, const Dav1dSettings *s);
extern int dav1d_send_data(Dav1dContext *c, Dav1dData *in);
extern int dav1d_get_picture(Dav1dContext *c, Dav1dPicture *out);
extern void dav1d_picture_unref(Dav1dPicture *p);
extern void dav1d_close(Dav1dContext **c);
extern int dav1d_data_wrap(Dav1dData *data, const uint8_t *buf, size_t sz,
                           void (*free_callback)(const uint8_t *, void *),
                           void *cookie);

static void free_cb(const uint8_t *buf, void *cookie) {
    (void)buf;
    (void)cookie;
}

const char *dav1d_shim_version(void) { return dav1d_version(); }

/* Decode one temporal unit; copy planes into caller buffers (caller sizes
 * them as w*h, cw*ch, cw*ch with cw=(w+ss_x)>>ss_x etc. based on layout).
 * Returns 0 on success; negative dav1d error otherwise.
 * out_meta: [w, h, layout, bpc] */
int dav1d_shim_decode(const uint8_t *obus, size_t len, uint8_t *out_y,
                      uint8_t *out_u, uint8_t *out_v, int32_t *out_meta) {
    Dav1dSettings s;
    Dav1dContext *ctx = NULL;
    Dav1dPicture pic;
    Dav1dData data;
    int res;

    dav1d_default_settings(&s);
    s.n_threads = 1;
    res = dav1d_open(&ctx, &s);
    if (res < 0) return res;

    memset(&data, 0, sizeof(data));
    res = dav1d_data_wrap(&data, obus, len, free_cb, NULL);
    if (res < 0) { dav1d_close(&ctx); return res; }

    res = dav1d_send_data(ctx, &data);
    if (res < 0 && res != -11 /*EAGAIN*/) { dav1d_close(&ctx); return res; }

    memset(&pic, 0, sizeof(pic));
    res = dav1d_get_picture(ctx, &pic);
    if (res < 0) {
        /* flush: send NULL-equivalent by draining */
        res = dav1d_get_picture(ctx, &pic);
        if (res < 0) { dav1d_close(&ctx); return res; }
    }

    int w = pic.p.w, h = pic.p.h, layout = pic.p.layout, bpc = pic.p.bpc;
    out_meta[0] = w; out_meta[1] = h; out_meta[2] = layout; out_meta[3] = bpc;
    int bytes = bpc > 8 ? 2 : 1;

    for (int r = 0; r < h; r++)
        memcpy(out_y + (size_t)r * w * bytes,
               (uint8_t *)pic.data[0] + r * pic.stride[0], (size_t)w * bytes);
    if (layout != 0 /* not I400 */ && out_u && out_v) {
        int ss_x = layout != 3; /* I444 */
        int ss_y = layout == 1; /* I420 */
        int cw = (w + ss_x) >> ss_x, ch = (h + ss_y) >> ss_y;
        for (int r = 0; r < ch; r++) {
            memcpy(out_u + (size_t)r * cw * bytes,
                   (uint8_t *)pic.data[1] + r * pic.stride[1], (size_t)cw * bytes);
            memcpy(out_v + (size_t)r * cw * bytes,
                   (uint8_t *)pic.data[2] + r * pic.stride[1], (size_t)cw * bytes);
        }
    }
    dav1d_picture_unref(&pic);
    dav1d_close(&ctx);
    return 0;
}

/* Decode a whole stream (many TUs); copy picture number `want` (0-based).
 * Returns 0 on success, -1000-err on decode error, -2000 if not enough
 * pictures. */
int dav1d_shim_decode_seq(const uint8_t *obus, size_t len, int want,
                          uint8_t *out_y, uint8_t *out_u, uint8_t *out_v,
                          int32_t *out_meta) {
    Dav1dSettings s;
    Dav1dContext *ctx = NULL;
    Dav1dData data;
    int res, got = 0, found = 0;

    dav1d_default_settings(&s);
    s.n_threads = 1;
    res = dav1d_open(&ctx, &s);
    if (res < 0) return -1000 + res;
    memset(&data, 0, sizeof(data));
    res = dav1d_data_wrap(&data, obus, len, free_cb, NULL);
    if (res < 0) { dav1d_close(&ctx); return -1000 + res; }

    while (1) {
        if (data.sz) {
            res = dav1d_send_data(ctx, &data);
            if (res < 0 && res != -11) { dav1d_close(&ctx); return -1000 + res; }
        }
        Dav1dPicture pic;
        memset(&pic, 0, sizeof(pic));
        res = dav1d_get_picture(ctx, &pic);
        if (res == -11 /*EAGAIN*/) {
            if (!data.sz) break;
            continue;
        }
        if (res < 0) { dav1d_close(&ctx); return -1000 + res; }
        if (got == want) {
            int w = pic.p.w, h = pic.p.h, layout = pic.p.layout, bpc = pic.p.bpc;
            out_meta[0] = w; out_meta[1] = h; out_meta[2] = layout; out_meta[3] = bpc;
            int bytes = bpc > 8 ? 2 : 1;
            for (int r = 0; r < h; r++)
                memcpy(out_y + (size_t)r * w * bytes,
                       (uint8_t *)pic.data[0] + r * pic.stride[0], (size_t)w * bytes);
            if (layout != 0 && out_u && out_v) {
                int ss_x = layout != 3, ss_y = layout == 1;
                int cw = (w + ss_x) >> ss_x, ch = (h + ss_y) >> ss_y;
                for (int r = 0; r < ch; r++) {
                    memcpy(out_u + (size_t)r * cw * bytes,
                           (uint8_t *)pic.data[1] + r * pic.stride[1], (size_t)cw * bytes);
                    memcpy(out_v + (size_t)r * cw * bytes,
                           (uint8_t *)pic.data[2] + r * pic.stride[1], (size_t)cw * bytes);
                }
            }
            found = 1;
        }
        got++;
        dav1d_picture_unref(&pic);
    }
    dav1d_close(&ctx);
    return found ? 0 : -2000;
}
