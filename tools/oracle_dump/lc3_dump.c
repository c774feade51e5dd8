#include "lc3_dump.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static FILE* get_file(const char* name, const char* ext)
{
    static char  names[256][64];
    static FILE* files[256];
    static int   count = 0;
    const char*  dir   = getenv("LC3_DUMP_DIR");
    int          i;
    char         path[512];
    if (!dir)
        return NULL;
    for (i = 0; i < count; i++) {
        if (strcmp(names[i], name) == 0)
            return files[i];
    }
    snprintf(path, sizeof(path), "%s/%s.%s", dir, name, ext);
    files[count] = fopen(path, "wb");
    snprintf(names[count], sizeof(names[count]), "%s", name);
    return files[count++];
}

void lc3_dump_f32(const char* name, const float* data, int n)
{
    FILE* f = get_file(name, "f32");
    if (f) { fwrite(data, sizeof(float), n, f); fflush(f); }
}

void lc3_dump_i32(const char* name, const int32_t* data, int n)
{
    FILE* f = get_file(name, "i32");
    if (f) { fwrite(data, sizeof(int32_t), n, f); fflush(f); }
}

void lc3_dump_u8(const char* name, const uint8_t* data, int n)
{
    FILE* f = get_file(name, "u8");
    if (f) { fwrite(data, sizeof(uint8_t), n, f); fflush(f); }
}

void lc3_dump_i16(const char* name, const int16_t* data, int n)
{
    FILE* f = get_file(name, "i16");
    if (f) { fwrite(data, sizeof(int16_t), n, f); fflush(f); }
}
