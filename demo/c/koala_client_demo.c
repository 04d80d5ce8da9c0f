/*
 * koala_client_demo — C client for the koala_tpu TCP streaming service.
 *
 * The TPU-native analog of the reference's C file demo (reference:
 * demo/c/koala_demo_file.c — there the C program dlopen's the local
 * engine; here the engine lives on a TPU host behind scripts/serve_tcp.py
 * and the C program streams PCM over a socket). WAV I/O is minimal 16 kHz
 * mono 16-bit (44-byte-header convention the reference's web tests use,
 * binding/web/cypress/support/commands.ts:1-9).
 *
 * Build:  make -C demo/c
 * Run:    python scripts/serve_tcp.py &            # on the TPU host
 *         ./demo/c/koala_client_demo in.wav out.wav [host] [port]
 *
 * Prints the same real-time-factor line as the reference C demo.
 */

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#define SAMPLE_RATE 16000
#define FRAME_LENGTH 256

static double now_sec(void) {
    struct timeval tv;
    gettimeofday(&tv, NULL);
    return tv.tv_sec + tv.tv_usec * 1e-6;
}

/* Minimal WAV reader: validates 16 kHz mono s16le, returns sample count. */
static int16_t *read_wav(const char *path, uint32_t *num_samples) {
    FILE *f = fopen(path, "rb");
    if (!f) { fprintf(stderr, "cannot open `%s`\n", path); return NULL; }
    uint8_t header[44];
    if (fread(header, 1, 44, f) != 44 || memcmp(header, "RIFF", 4) != 0 ||
        memcmp(header + 8, "WAVE", 4) != 0) {
        fprintf(stderr, "`%s` is not a WAV file\n", path);
        fclose(f);
        return NULL;
    }
    uint16_t channels, bits;
    uint32_t rate;
    memcpy(&channels, header + 22, 2);
    memcpy(&rate, header + 24, 4);
    memcpy(&bits, header + 34, 2);
    if (channels != 1 || rate != SAMPLE_RATE || bits != 16) {
        fprintf(stderr, "expected 16 kHz mono 16-bit, got %u ch %u Hz %u bit\n",
                channels, rate, bits);
        fclose(f);
        return NULL;
    }
    fseek(f, 0, SEEK_END);
    long end = ftell(f);
    fseek(f, 44, SEEK_SET);
    uint32_t n = (uint32_t)((end - 44) / 2);
    int16_t *pcm = malloc(n * sizeof(int16_t));
    if (!pcm || fread(pcm, 2, n, f) != n) {
        fprintf(stderr, "failed to read samples\n");
        free(pcm);
        fclose(f);
        return NULL;
    }
    fclose(f);
    *num_samples = n;
    return pcm;
}

static int write_wav(const char *path, const int16_t *pcm, uint32_t n) {
    FILE *f = fopen(path, "wb");
    if (!f) return -1;
    uint32_t data_bytes = n * 2, chunk = 36 + data_bytes, rate = SAMPLE_RATE;
    uint32_t byte_rate = SAMPLE_RATE * 2;
    uint16_t fmt = 1, channels = 1, block = 2, bits = 16;
    uint32_t sub1 = 16;
    fwrite("RIFF", 1, 4, f); fwrite(&chunk, 4, 1, f); fwrite("WAVE", 1, 4, f);
    fwrite("fmt ", 1, 4, f); fwrite(&sub1, 4, 1, f); fwrite(&fmt, 2, 1, f);
    fwrite(&channels, 2, 1, f); fwrite(&rate, 4, 1, f);
    fwrite(&byte_rate, 4, 1, f); fwrite(&block, 2, 1, f); fwrite(&bits, 2, 1, f);
    fwrite("data", 1, 4, f); fwrite(&data_bytes, 4, 1, f);
    fwrite(pcm, 2, n, f);
    fclose(f);
    return 0;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr,
                "usage: %s input.wav output.wav [host] [port]\n", argv[0]);
        return 1;
    }
    const char *host = argc > 3 ? argv[3] : "127.0.0.1";
    int port = argc > 4 ? atoi(argv[4]) : 7532;

    uint32_t num_samples = 0;
    int16_t *pcm = read_wav(argv[1], &num_samples);
    if (!pcm) return 1;

    int fd = socket(AF_INET, SOCK_STREAM, 0);
    struct sockaddr_in addr = {0};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    if (inet_pton(AF_INET, host, &addr.sin_addr) != 1 ||
        connect(fd, (struct sockaddr *)&addr, sizeof(addr)) != 0) {
        fprintf(stderr, "cannot connect to %s:%d (is serve_tcp.py running?)\n",
                host, port);
        free(pcm);
        return 1;
    }
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));

    int16_t *enhanced = malloc((num_samples + FRAME_LENGTH) * sizeof(int16_t));
    uint32_t received = 0;

    double start = now_sec();

    /* stream frames; interleave reads so neither side blocks */
    uint32_t sent = 0;
    while (sent < num_samples) {
        uint32_t chunk_samples = num_samples - sent;
        if (chunk_samples > FRAME_LENGTH) chunk_samples = FRAME_LENGTH;
        ssize_t w = send(fd, pcm + sent, chunk_samples * 2, 0);
        if (w <= 0) { fprintf(stderr, "send failed\n"); return 1; }
        sent += (uint32_t)(w / 2);

        /* opportunistic non-blocking drain */
        ssize_t r;
        char buf[8192];
        while (received < num_samples &&
               (r = recv(fd, buf, sizeof(buf), MSG_DONTWAIT)) > 0) {
            uint32_t take = (uint32_t)(r / 2);
            if (received + take > num_samples) take = num_samples - received;
            memcpy(enhanced + received, buf, take * 2);
            received += take;
        }
    }
    shutdown(fd, SHUT_WR); /* triggers the server's delay flush */

    while (received < num_samples) {
        int16_t buf[4096];
        ssize_t r = recv(fd, buf, sizeof(buf), 0);
        if (r <= 0) break;
        uint32_t take = (uint32_t)(r / 2);
        if (received + take > num_samples) take = num_samples - received;
        memcpy(enhanced + received, buf, take * 2);
        received += take;
    }
    double proc_sec = now_sec() - start;
    close(fd);

    /* The server performs delay compensation: it returns exactly
     * len(input) enhanced samples aligned 1:1 with the input. */
    double audio_sec = (double)num_samples / SAMPLE_RATE;
    printf("Processed %.3f s of audio in %.3f s\n", audio_sec, proc_sec);
    printf("Real time factor: %.3f\n", proc_sec / audio_sec);

    if (write_wav(argv[2], enhanced, received) != 0) {
        fprintf(stderr, "failed to write `%s`\n", argv[2]);
        return 1;
    }
    printf("wrote %s (%u samples)\n", argv[2], received);
    free(pcm);
    free(enhanced);
    return 0;
}
