// videodec: first-party FFmpeg-based frame-accurate video decoder.
//
// TPU-native replacement for the decord dependency the reference leans on
// (reference: stllm/datasets/datasets/utils.py:345-373 — VideoReader open,
// avg_fps, frame count, random-access get_batch). Exposed as a C ABI so
// Python binds over ctypes (no pybind11 in this image).
//
// Model: on open we demux-scan the whole stream once (no decode) to build an
// exact pts index per frame — this is what makes gather frame-accurate like
// decord, instead of fps-arithmetic seeking. get_batch seeks to the keyframe
// at-or-before each requested frame and decodes forward, reusing the decoder
// state when requests are monotonically close.

#ifndef STLLM_VIDEODEC_H_
#define STLLM_VIDEODEC_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct VDHandle VDHandle;

// Open a video file. Returns NULL on failure (see vd_last_error()).
VDHandle* vd_open(const char* path, int num_threads);

void vd_close(VDHandle* h);

// Exact number of decodable frames (from the demux scan).
int64_t vd_num_frames(const VDHandle* h);

// Average fps = num_frames / duration.
double vd_avg_fps(const VDHandle* h);

// Output frame geometry (after rotation metadata is applied: none).
int vd_width(const VDHandle* h);
int vd_height(const VDHandle* h);

// Decode the given frame indices (any order, duplicates allowed) into `out`,
// which must hold n * height * width * 3 bytes (RGB24, frame-major).
// Returns 0 on success, negative on error.
int vd_get_batch(VDHandle* h, const int64_t* indices, int64_t n, uint8_t* out);

// Thread-local message for the last failure.
const char* vd_last_error(void);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // STLLM_VIDEODEC_H_
