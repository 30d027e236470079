/* Reference-ENCODER harness: CSV (uuid_hex,time,v1,v2,...) -> a
   directory-format .tdb through the reference's own cons/encode
   pipeline (src/tdb_cons.c, src/tdb_encode.c: edge encoding, Apriori
   bigram candidates, Huffman codebook). Used as

   1. the SIZE-parity oracle: same corpus -> our literal / our
      unigram-Huffman / reference bigram-Huffman bytes (COVERAGE.md);
   2. the encode half of the interop differential: C-encode ->
      python-decode (read_tdb), complementing the python-encode ->
      C-decode gold chain dump.c captures.

   Values use the same \xNN escaping as dump.c, so dump(make(x)) == x
   textually. TDB_CONS_NO_BIGRAMS=1 in the environment selects the
   reference's own unigram-only mode (tests/c-tests/tdb_test.h:9-33) —
   the apples-to-apples lane against our unigram writer.

   Build (same recipe as dump.c, plus the encode TUs):
     gcc -O2 -DDSFMT_MEXP=521 -include inttypes.h -I. \
         -I/root/reference/src -o tdb_make make.c \
         /root/reference/src/tdb.c /root/reference/src/tdb_cons.c \
         /root/reference/src/tdb_encode.c \
         /root/reference/src/tdb_encode_model.c \
         /root/reference/src/tdb_huffman.c \
         /root/reference/src/tdb_decode.c \
         /root/reference/src/tdb_package.c \
         /root/reference/src/tdb_queue.c /root/reference/src/tdb_uuid.c \
         /root/reference/src/judy_str_map.c \
         /root/reference/src/judy_128_map.c \
         /root/reference/src/arena.c \
         /root/reference/src/xxhash/xxhash.c \
         /root/reference/src/dsfmt/dSFMT.c
*/
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <traildb.h>

static int unhex(char c)
{
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return -1;
}

/* \xNN unescape in place; returns decoded length */
static uint64_t unesc(char *s)
{
    char *w = s, *r = s;
    while (*r) {
        if (r[0] == '\\' && r[1] == 'x' && unhex(r[2]) >= 0 &&
                unhex(r[3]) >= 0) {
            *w++ = (char)(unhex(r[2]) * 16 + unhex(r[3]));
            r += 4;
        } else
            *w++ = *r++;
    }
    *w = 0;
    return (uint64_t)(w - s);
}

int main(int argc, char **argv)
{
    if (argc < 3) {
        /* zero ofields (time-only events, tests/c-tests/zero_fields.c)
           is a legal tdb — argc == 3 selects it */
        fprintf(stderr,
                "usage: tdb_make in.csv outdir [field1 field2 ...]\n");
        return 2;
    }
    const char *fields[64];
    uint64_t nf = (uint64_t)(argc - 3);
    if (nf > 64) { fprintf(stderr, "too many fields\n"); return 2; }
    for (uint64_t i = 0; i < nf; i++)
        fields[i] = argv[3 + i];

    tdb_cons *cons = tdb_cons_init();
    if (getenv("TDB_CONS_NO_BIGRAMS")) {
        tdb_opt_value v = {.value = 1};
        tdb_cons_set_opt(cons, TDB_OPT_CONS_NO_BIGRAMS, v);
    }
    tdb_error e = tdb_cons_open(cons, argv[2], fields, nf);
    if (e) { fprintf(stderr, "cons_open: %s\n", tdb_error_str(e)); return 1; }

    FILE *in = fopen(argv[1], "r");
    if (!in) { perror("open csv"); return 1; }
    char line[1 << 16];
    const char *values[64];
    uint64_t lengths[64];
    uint64_t n_rows = 0;
    while (fgets(line, sizeof line, in)) {
        size_t len = strlen(line);
        while (len && (line[len - 1] == '\n' || line[len - 1] == '\r'))
            line[--len] = 0;
        if (!len) continue;
        /* uuid_hex , time , v1 , v2 ... (values \xNN-escaped) */
        char *p = line;
        char *comma = strchr(p, ',');
        if (!comma || (size_t)(comma - p) != 32) {
            fprintf(stderr, "bad uuid on line %" PRIu64 "\n", n_rows + 1);
            return 1;
        }
        *comma = 0;
        uint8_t uuid[16];
        if (tdb_uuid_raw((const uint8_t*)p, uuid)) {
            fprintf(stderr, "bad uuid hex on line %" PRIu64 "\n", n_rows + 1);
            return 1;
        }
        p = comma + 1;
        uint64_t ts = strtoull(p, &comma, 10);
        for (uint64_t f = 0; f < nf; f++) {
            if (*comma != ',') {
                fprintf(stderr, "short line %" PRIu64 "\n", n_rows + 1);
                return 1;
            }
            p = comma + 1;
            comma = strchr(p, ',');
            if (!comma) comma = p + strlen(p);
            char saved = *comma;
            *comma = 0;
            lengths[f] = unesc(p);
            values[f] = p;
            if (saved) { /* keep scanning from the original spot */
                *comma = saved;
            }
        }
        e = tdb_cons_add(cons, uuid, ts, values, lengths);
        if (e) { fprintf(stderr, "cons_add: %s\n", tdb_error_str(e)); return 1; }
        n_rows++;
    }
    fclose(in);

    e = tdb_cons_finalize(cons);
    if (e) { fprintf(stderr, "finalize: %s\n", tdb_error_str(e)); return 1; }
    tdb_cons_close(cons);
    fprintf(stderr, "encoded %" PRIu64 " events -> %s\n", n_rows, argv[2]);
    return 0;
}
