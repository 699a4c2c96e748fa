// Shard-streaming downloader: HTTP(S) -> stdout with low-speed abort and
// infinite range-resume retry.
//
// Same role and behavior as the reference's libcurl wrapper
// (/root/reference/dataset/downloader_src/main.cpp): used as a
// `pipe:downloader URL` source for webdataset-style shard streaming.
// Aborts a transfer that drops below 30 B/s for 60 s and resumes from the
// byte offset already delivered, retrying forever until the stream
// completes. Transfers are delegated to the curl binary (this image ships
// no libcurl headers); the resume/retry state machine lives here.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unistd.h>
#include <sys/wait.h>

static long long g_delivered = 0;

// run one curl attempt resuming at `offset`; returns curl's exit code and
// accumulates delivered bytes
static int attempt(const std::string& url, long long offset) {
    std::string cmd =
        "exec curl -s -S -L --fail --speed-limit 30 --speed-time 60 ";
    if (offset > 0) {
        char buf[64];
        snprintf(buf, sizeof(buf), "-C %lld ", offset);
        cmd += buf;
    }
    cmd += "-- '" + url + "'";

    FILE* p = popen(cmd.c_str(), "r");
    if (!p) return -1;
    char buf[1 << 16];
    size_t n;
    while ((n = fread(buf, 1, sizeof(buf), p)) > 0) {
        if (fwrite(buf, 1, n, stdout) != n) {
            pclose(p);
            return -2;  // downstream closed; stop
        }
        g_delivered += (long long)n;
    }
    fflush(stdout);
    int rc = pclose(p);
    if (WIFEXITED(rc)) return WEXITSTATUS(rc);
    return -1;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: downloader <url>\n");
        return 2;
    }
    std::string url(argv[1]);
    // quote-safety: reject embedded single quotes
    if (url.find('\'') != std::string::npos) {
        fprintf(stderr, "invalid url\n");
        return 2;
    }

    int backoff = 1;
    for (;;) {
        long long before = g_delivered;
        int rc = attempt(url, g_delivered);
        if (rc == 0) return 0;            // complete
        if (rc == -2) return 0;           // consumer closed the pipe
        // 416: requested range not satisfiable — already complete
        if (rc == 33 && g_delivered > 0) return 0;
        fprintf(stderr, "downloader: curl rc=%d at %lld bytes, retrying\n",
                rc, g_delivered);
        if (g_delivered == before) {
            sleep(backoff);
            if (backoff < 30) backoff *= 2;
        } else {
            backoff = 1;                  // progress was made
        }
    }
}
