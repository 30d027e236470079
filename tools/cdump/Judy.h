/* Minimal JudyL shim for compiling the reference READ path in this
   container (libJudy is absent). Only the per-trail event-filter
   bookkeeping uses JudyL in the read path (tdb.c / tdb_decode.c), and
   the dump harness never sets filters — a linked-list assoc is ample. */
#ifndef JUDY_STUB_H
#define JUDY_STUB_H
#include <stdlib.h>
typedef void * Pvoid_t;
typedef unsigned long Word_t;
struct judy_stub_node { Word_t key; Word_t val; struct judy_stub_node *next; };
static inline Word_t *judy_stub_ins(Pvoid_t *arr, Word_t key) {
    struct judy_stub_node *n = (struct judy_stub_node*)*arr;
    for (; n; n = n->next) if (n->key == key) return &n->val;
    n = (struct judy_stub_node*)calloc(1, sizeof *n);
    n->key = key; n->next = (struct judy_stub_node*)*arr;
    *arr = n; return &n->val;
}
static inline Word_t *judy_stub_get(Pvoid_t arr, Word_t key) {
    struct judy_stub_node *n = (struct judy_stub_node*)arr;
    for (; n; n = n->next) if (n->key == key) return &n->val;
    return NULL;
}
static inline int judy_stub_del(Pvoid_t *arr, Word_t key) {
    struct judy_stub_node **pp = (struct judy_stub_node**)arr, *n;
    while ((n = *pp)) {
        if (n->key == key) { *pp = n->next; free(n); return 1; }
        pp = &n->next;
    }
    return 0;
}
static inline Word_t judy_stub_free(Pvoid_t *arr) {
    struct judy_stub_node *n = (struct judy_stub_node*)*arr, *t;
    Word_t c = 0;
    while (n) { t = n->next; free(n); n = t; c += sizeof *n; }
    *arr = NULL; return c;
}
#define JLI(p, arr, idx) ((p) = (void*)judy_stub_ins(&(arr), (Word_t)(idx)))
#define JLG(p, arr, idx) ((p) = (void*)judy_stub_get((arr), (Word_t)(idx)))
#define JLD(rc, arr, idx) ((rc) = judy_stub_del(&(arr), (Word_t)(idx)))
#define JLFA(rc, arr) ((rc) = judy_stub_free(&(arr)))
#endif
