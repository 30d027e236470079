/* Minimal gold-dump harness: open a tdb, dump every event as CSV with
   \xNN escaping for comma/backslash/control chars. */
#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include <traildb.h>

static void esc(const char *s, uint64_t n) {
    for (uint64_t i = 0; i < n; i++) {
        unsigned char c = (unsigned char)s[i];
        if (c == ',' || c == '\\' || c < 32) printf("\\x%02x", c);
        else putchar(c);
    }
}

int main(int argc, char **argv) {
    tdb *db = tdb_init();
    tdb_error e = tdb_open(db, argv[1]);
    if (e) { fprintf(stderr, "open: %s\n", tdb_error_str(e)); return 1; }
    uint64_t nt = tdb_num_trails(db), nf = tdb_num_fields(db);
    tdb_cursor *c = tdb_cursor_new(db);
    for (uint64_t t = 0; t < nt; t++) {
        const uint8_t *u = tdb_get_uuid(db, t);
        char hex[33];
        for (int i = 0; i < 16; i++) sprintf(hex + 2 * i, "%02x", u[i]);
        tdb_get_trail(c, t);
        const tdb_event *ev;
        while ((ev = tdb_cursor_next(c))) {
            printf("%s,%llu", hex, (unsigned long long)ev->timestamp);
            for (uint64_t f = 0; f < nf - 1; f++) {
                uint64_t len;
                const char *v = tdb_get_item_value(db, ev->items[f], &len);
                putchar(',');
                esc(v ? v : "", v ? len : 0);
            }
            putchar('\n');
        }
    }
    tdb_cursor_free(c);
    tdb_close(db);
    return 0;
}
