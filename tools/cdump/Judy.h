/* Minimal Judy shim (libJudy is absent in this container): an open-
   addressing hashmap with a lazily-sorted key view, covering the subset
   of the JudyL / Judy1 macro API that the reference's READ path
   (tdb.c / tdb_decode.c: JLI/JLG/JLD/JLFA) and ENCODE path
   (judy_str_map.c, judy_128_map.c, tdb_encode_model.c:
   JLF/JLN ordered iteration, J1S/J1T/J1FA bitset) actually use.

   Semantics honored:
   - JLI/JLG return a pointer to the value slot, valid until the next
     modification of the SAME array — the reference always dereferences
     immediately (judy_str_map.c:62-96, judy_128_map.c:32-37), and
     j128m_insert's interleaved JLI touches a DIFFERENT array between
     the hi-map insert and the *hi_ptr write-back.
   - JLF/JLN iterate in ASCENDING key order: j128m_fold feeds
     store_uuids (sorted-uuid invariant, src/tdb_cons.c) and the
     unigram scan collects candidates in item order
     (src/tdb_encode_model.c:320-334) — a hash-order shim would break
     both.
   - JLFA/J1FA return an approximate freed-byte count (callers only
     sink it into a scratch variable).

   Test-oracle quality, not a Judy replacement: O(log n) lazy sort per
   first-iteration-after-modify, O(n) delete. */
#ifndef JUDY_STUB_H
#define JUDY_STUB_H
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef void * Pvoid_t;
typedef unsigned long Word_t;

struct jshim_pair { Word_t key; size_t idx; };

struct jshim {
    Word_t *keys, *vals;        /* parallel arrays, insertion order */
    size_t n, cap;
    size_t *slots;              /* open addressing; entry = idx + 1 */
    size_t nslots;              /* power of two */
    struct jshim_pair *order;   /* ascending-key view, lazily rebuilt */
    int order_valid;
};

static inline size_t jshim_hash(Word_t k, size_t m)
{
    k ^= k >> 33; k *= 0xff51afd7ed558ccdUL; k ^= k >> 33;
    k *= 0xc4ceb9fe1a85ec53UL; k ^= k >> 33;
    return (size_t)(k & (m - 1));
}

static inline void jshim_rehash(struct jshim *j, size_t m)
{
    size_t i, s;
    free(j->slots);
    j->slots = (size_t*)calloc(m, sizeof(size_t));
    j->nslots = m;
    for (i = 0; i < j->n; i++) {
        s = jshim_hash(j->keys[i], m);
        while (j->slots[s]) s = (s + 1) & (m - 1);
        j->slots[s] = i + 1;
    }
}

static inline size_t jshim_find(const struct jshim *j, Word_t key)
{
    size_t s;
    if (!j || !j->nslots) return (size_t)-1;
    s = jshim_hash(key, j->nslots);
    while (j->slots[s]) {
        if (j->keys[j->slots[s] - 1] == key) return j->slots[s] - 1;
        s = (s + 1) & (j->nslots - 1);
    }
    return (size_t)-1;
}

static inline Word_t *jshim_ins(Pvoid_t *arr, Word_t key)
{
    struct jshim *j = (struct jshim*)*arr;
    size_t i, s;
    if (!j) { j = (struct jshim*)calloc(1, sizeof *j); *arr = j; }
    i = jshim_find(j, key);
    if (i != (size_t)-1) return &j->vals[i];
    if (j->n == j->cap) {
        j->cap = j->cap ? j->cap * 2 : 16;
        j->keys = (Word_t*)realloc(j->keys, j->cap * sizeof(Word_t));
        j->vals = (Word_t*)realloc(j->vals, j->cap * sizeof(Word_t));
    }
    if ((j->n + 1) * 2 > j->nslots)
        jshim_rehash(j, j->nslots ? j->nslots * 2 : 32);
    j->keys[j->n] = key;
    j->vals[j->n] = 0;
    s = jshim_hash(key, j->nslots);
    while (j->slots[s]) s = (s + 1) & (j->nslots - 1);
    j->slots[s] = j->n + 1;
    j->order_valid = 0;
    j->n++;
    return &j->vals[j->n - 1];
}

static inline Word_t *jshim_get(Pvoid_t arr, Word_t key)
{
    struct jshim *j = (struct jshim*)arr;
    size_t i;
    if (!j) return NULL;
    i = jshim_find(j, key);
    return i == (size_t)-1 ? NULL : &j->vals[i];
}

static inline int jshim_del(Pvoid_t *arr, Word_t key)
{
    struct jshim *j = (struct jshim*)*arr;
    size_t i;
    if (!j) return 0;
    i = jshim_find(j, key);
    if (i == (size_t)-1) return 0;
    j->keys[i] = j->keys[j->n - 1];   /* swap-with-last, then rehash */
    j->vals[i] = j->vals[j->n - 1];
    j->n--;
    j->order_valid = 0;
    jshim_rehash(j, j->nslots);
    return 1;
}

static inline Word_t jshim_freearr(Pvoid_t *arr)
{
    struct jshim *j = (struct jshim*)*arr;
    Word_t bytes;
    if (!j) return 0;
    bytes = (Word_t)(j->cap * 2 * sizeof(Word_t) + sizeof *j);
    free(j->keys); free(j->vals); free(j->slots); free(j->order); free(j);
    *arr = NULL;
    return bytes;
}

static inline int jshim_paircmp(const void *a, const void *b)
{
    Word_t ka = ((const struct jshim_pair*)a)->key;
    Word_t kb = ((const struct jshim_pair*)b)->key;
    return ka < kb ? -1 : ka > kb ? 1 : 0;
}

static inline void jshim_sort(struct jshim *j)
{
    size_t i;
    if (j->order_valid) return;
    j->order = (struct jshim_pair*)realloc(
        j->order, (j->n ? j->n : 1) * sizeof(struct jshim_pair));
    for (i = 0; i < j->n; i++) {
        j->order[i].key = j->keys[i];
        j->order[i].idx = i;
    }
    qsort(j->order, j->n, sizeof(struct jshim_pair), jshim_paircmp);
    j->order_valid = 1;
}

/* first key >= *idx in ascending order; NULL when exhausted */
static inline Word_t *jshim_first(Pvoid_t arr, Word_t *idx)
{
    struct jshim *j = (struct jshim*)arr;
    size_t lo = 0, hi, mid;
    if (!j || !j->n) return NULL;
    jshim_sort(j);
    hi = j->n;
    while (lo < hi) {
        mid = lo + (hi - lo) / 2;
        if (j->order[mid].key < *idx) lo = mid + 1; else hi = mid;
    }
    if (lo == j->n) return NULL;
    *idx = j->order[lo].key;
    return &j->vals[j->order[lo].idx];
}

static inline Word_t *jshim_next(Pvoid_t arr, Word_t *idx)
{
    Word_t want;
    if (*idx == (Word_t)-1) return NULL;  /* no key above ULONG_MAX */
    want = *idx + 1;
    {
        Word_t *p = jshim_first(arr, &want);
        if (p) *idx = want;
        return p;
    }
}

static inline int jshim_set(Pvoid_t *arr, Word_t key)
{
    struct jshim *j = (struct jshim*)*arr;
    if (j && jshim_find(j, key) != (size_t)-1) return 0;
    (void)jshim_ins(arr, key);
    return 1;
}

/* JudyL */
#define JLI(p, arr, idx)  ((p) = (void*)jshim_ins(&(arr), (Word_t)(idx)))
#define JLG(p, arr, idx)  ((p) = (void*)jshim_get((arr), (Word_t)(idx)))
#define JLD(rc, arr, idx) ((rc) = jshim_del(&(arr), (Word_t)(idx)))
#define JLFA(rc, arr)     ((rc) = jshim_freearr(&(arr)))
#define JLF(p, arr, idx) do { \
    Word_t jshim__i = (Word_t)(idx); \
    (p) = (void*)jshim_first((arr), &jshim__i); \
    (idx) = jshim__i; \
} while (0)
#define JLN(p, arr, idx) do { \
    Word_t jshim__i = (Word_t)(idx); \
    (p) = (void*)jshim_next((arr), &jshim__i); \
    (idx) = jshim__i; \
} while (0)

/* Judy1 (bitset over the same structure; vals unused) */
#define J1S(rc, arr, idx) ((rc) = jshim_set(&(arr), (Word_t)(idx)))
#define J1T(rc, arr, idx) ((rc) = (jshim_get((arr), (Word_t)(idx)) != NULL))
#define J1FA(rc, arr)     ((rc) = jshim_freearr(&(arr)))

/* JudySL (string keys): only the constructor's duplicate-fieldname
   check uses it (src/tdb_cons.c:198-223, <=16k keys) — a linked list
   is ample. */
struct jslshim_node {
    char *key;
    Word_t val;
    struct jslshim_node *next;
};

static inline Word_t *jslshim_ins(Pvoid_t *arr, const char *key)
{
    struct jslshim_node *n = (struct jslshim_node*)*arr;
    for (; n; n = n->next)
        if (!strcmp(n->key, key)) return &n->val;
    n = (struct jslshim_node*)calloc(1, sizeof *n);
    n->key = strdup(key);
    n->next = (struct jslshim_node*)*arr;
    *arr = n;
    return &n->val;
}

static inline Word_t jslshim_free(Pvoid_t *arr)
{
    struct jslshim_node *n = (struct jslshim_node*)*arr, *t;
    Word_t c = 0;
    while (n) {
        t = n->next;
        c += sizeof *n + strlen(n->key) + 1;
        free(n->key);
        free(n);
        n = t;
    }
    *arr = NULL;
    return c;
}

#define JSLI(p, arr, idx) ((p) = (void*)jslshim_ins(&(arr), (const char*)(idx)))
#define JSLFA(rc, arr)    ((rc) = jslshim_free(&(arr)))

#endif
