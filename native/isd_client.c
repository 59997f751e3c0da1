/* isd_client — minimal C client for the ISD1 decode protocol.
 *
 * Proof of the serving daemon's portability claim
 * (imagined_speech_decoding_tpu/server.py: the wire format is
 * deliberately dependency-free so non-Python acquisition hosts can
 * speak it from a few dozen lines of C). This file is that client:
 * plain C99 + POSIX sockets, no third-party code. An acquisition host
 * links the three isd_* functions below; the main() is a demo/test
 * driver.
 *
 * Usage:
 *   isd_client HOST PORT info
 *       print the server's JSON metadata line
 *   isd_client HOST PORT decode B C T [<raw.f32]
 *       read B*C*T little-endian f32 samples from stdin (or, with no
 *       piped stdin, generate a deterministic test pattern), send one
 *       DECODE, print the (B, K) posteriors one row per line
 *   isd_client HOST PORT decode_all B C T [<raw.f32]
 *       fleet servers: every model's posteriors, M*B rows (model-major)
 *   isd_client HOST PORT shutdown
 *       stop the server
 *
 * Frame layout (little-endian): <4s B I  = "ISD1", type u8, payload u32.
 * The reference stack has no serving tier at all; consumers re-build
 * the torch model in-process (/root/reference/scripts/explain_fast.py:32-54).
 */

#define _POSIX_C_SOURCE 200112L /* getaddrinfo under -std=c99 */

#include <arpa/inet.h>
#include <netdb.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <unistd.h>

static int io_exact(int fd, void *buf, size_t n, int writing) {
  char *p = (char *)buf;
  while (n) {
    ssize_t k = writing ? write(fd, p, n) : read(fd, p, n);
    if (k <= 0) return -1; /* EOF or error mid-frame */
    p += k;
    n -= (size_t)k;
  }
  return 0;
}

/* Send one frame: type + payload (payload may be NULL when len == 0). */
static int isd_send(int fd, uint8_t type, const void *payload, uint32_t len) {
  uint8_t hdr[9] = {'I', 'S', 'D', '1', type};
  memcpy(hdr + 5, &len, 4); /* little-endian hosts only, like the protocol */
  if (io_exact(fd, hdr, 9, 1)) return -1;
  return len ? io_exact(fd, (void *)payload, len, 1) : 0;
}

/* Receive one frame; *payload is malloc'd (caller frees). Returns the
 * response type, or -1 on transport/protocol failure. */
static int isd_recv(int fd, uint8_t **payload, uint32_t *len) {
  uint8_t hdr[9];
  if (io_exact(fd, hdr, 9, 0) || memcmp(hdr, "ISD1", 4)) return -1;
  memcpy(len, hdr + 5, 4);
  *payload = NULL;
  if (*len) {
    *payload = (uint8_t *)malloc(*len);
    if (!*payload || io_exact(fd, *payload, *len, 0)) {
      free(*payload);
      return -1;
    }
  }
  return hdr[4];
}

static int isd_connect(const char *host, const char *port) {
  struct addrinfo hints = {0}, *res, *ai;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host, port, &hints, &res)) return -1;
  int fd = -1;
  for (ai = res; ai; ai = ai->ai_next) {
    fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd >= 0 && !connect(fd, ai->ai_addr, ai->ai_addrlen)) break;
    if (fd >= 0) close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

static int die_if_err(int type, uint8_t *payload, uint32_t len) {
  if (type == 0xFF) {
    fprintf(stderr, "server error: %.*s\n", (int)len,
            payload ? (char *)payload : "");
    exit(2);
  }
  if (type < 0) {
    fprintf(stderr, "transport/protocol failure\n");
    exit(2);
  }
  return type;
}

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s HOST PORT info|decode|shutdown [B C T]\n", argv[0]);
    return 1;
  }
  int fd = isd_connect(argv[1], argv[2]);
  if (fd < 0) {
    fprintf(stderr, "cannot connect to %s:%s\n", argv[1], argv[2]);
    return 1;
  }
  uint8_t *rsp = NULL;
  uint32_t rlen = 0;

  if (!strcmp(argv[3], "info")) {
    if (isd_send(fd, 0x01, NULL, 0)) return 2;
    { int rt = isd_recv(fd, &rsp, &rlen); die_if_err(rt, rsp, rlen); }
    printf("%.*s\n", (int)rlen, (char *)rsp);
  } else if (!strcmp(argv[3], "shutdown")) {
    if (isd_send(fd, 0x04, NULL, 0)) return 2;
    { int rt = isd_recv(fd, &rsp, &rlen); die_if_err(rt, rsp, rlen); }
    printf("server stopped\n");
  } else if ((!strcmp(argv[3], "decode") || !strcmp(argv[3], "decode_all")) &&
             argc == 7) {
    int fleet = argv[3][6] != '\0'; /* "decode_all" */
    uint32_t b = (uint32_t)atoi(argv[4]), c = (uint32_t)atoi(argv[5]),
             t = (uint32_t)atoi(argv[6]);
    uint32_t n = b * c * t, plen = 12 + 4 * n;
    uint8_t *req = (uint8_t *)malloc(plen);
    memcpy(req, &b, 4);
    memcpy(req + 4, &c, 4);
    memcpy(req + 8, &t, 4);
    float *x = (float *)(req + 12);
    if (isatty(0)) { /* no piped data: deterministic ramp test pattern */
      for (uint32_t i = 0; i < n; i++) x[i] = (float)(i % 997) / 997.0f - 0.5f;
    } else if (io_exact(0, x, 4ull * n, 0)) {
      fprintf(stderr, "stdin ended before %u f32 samples\n", n);
      return 1;
    }
    if (isd_send(fd, fleet ? 0x05 : 0x02, req, plen)) return 2;
    free(req);
    { int rt = isd_recv(fd, &rsp, &rlen); die_if_err(rt, rsp, rlen); }
    /* plain: <II (B, K); fleet: <III (M, B, K) — print M*B rows */
    uint32_t om = 1, ob, ok, off = fleet ? 12 : 8;
    if (fleet) memcpy(&om, rsp, 4);
    memcpy(&ob, rsp + (fleet ? 4 : 0), 4);
    memcpy(&ok, rsp + (fleet ? 8 : 4), 4);
    float *post = (float *)(rsp + off);
    for (uint32_t i = 0; i < om * ob; i++) {
      for (uint32_t j = 0; j < ok; j++)
        printf("%s%.6f", j ? " " : "", (double)post[i * ok + j]);
      printf("\n");
    }
  } else {
    fprintf(stderr, "bad command\n");
    return 1;
  }
  free(rsp);
  close(fd);
  return 0;
}
