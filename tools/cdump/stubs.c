/* Link stubs: the read path never calls the encode-side judy_128_map
   (encode_gram is unreachable from tdb_open/cursor), and
   is_fieldname_invalid is reimplemented per tdb_cons.c:181-196 so we
   don't pull the whole constructor TU (which needs xxhash + more). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include "tdb_limits.h"

int is_fieldname_invalid(const char* field)
{
    uint64_t i;
    if (!strcmp(field, "time"))
        return 1;
    for (i = 0; i < TDB_MAX_FIELDNAME_LENGTH && field[i]; i++)
        if (!strchr(TDB_FIELDNAME_CHARS, field[i]))
            return 1;
    if (i == 0 || i == TDB_MAX_FIELDNAME_LENGTH)
        return 1;
    return 0;
}

void j128m_get(void) { abort(); }
void j128m_num_keys(void) { abort(); }
void j128m_fold(void) { abort(); }
void j128m_insert(void) { abort(); }
