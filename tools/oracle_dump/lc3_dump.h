/* Per-stage tensor dump facility injected into the oracle build (.oracle/).
 * Runtime-gated: only active when LC3_DUMP_DIR is set in the environment.
 * Each named buffer is appended (raw little-endian) to $LC3_DUMP_DIR/<name>.bin
 * one record per call, so frame k is record k. Used by tests/ to fetch golden
 * intermediates for every encoder/decoder stage. */
#ifndef LC3_DUMP_H
#define LC3_DUMP_H
#include <stdint.h>
void lc3_dump_f32(const char* name, const float* data, int n);
void lc3_dump_i32(const char* name, const int32_t* data, int n);
void lc3_dump_u8(const char* name, const uint8_t* data, int n);
void lc3_dump_i16(const char* name, const int16_t* data, int n);
#endif
