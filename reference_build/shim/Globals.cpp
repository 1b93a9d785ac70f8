// Shim globals: Debug level, validators, command registry, base64,
// the `databases` command, and the mmseqs index-version constant.
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "Command.h"
#include "Debug.h"
#include "DownloadDatabase.h"
#include "Parameters.h"

int Debug::debugLevel = Debug::INFO;

std::vector<int> DbValidator::empty = {};
std::vector<int> DbValidator::sequenceDb = {0};
std::vector<int> DbValidator::directory = {1};
std::vector<int> DbValidator::flatfile = {2};

const char *MMSEQS_CURRENT_INDEX_VERSION = "16";

std::vector<Command> baseCommands = {};
std::vector<Categories> categories = {
    {"Main", COMMAND_MAIN},
    {"Databases", COMMAND_DATABASE_CREATION},
    {"Format conversion", COMMAND_FORMAT_CONVERSION},
    {"Taxonomy", COMMAND_TAXONOMY},
    {"Expert", COMMAND_EXPERT},
};

static std::vector<Command> *registeredCommands = NULL;

void registerCommands(std::vector<Command> *commands) {
    registeredCommands = commands;
}

std::vector<Command> *getRegisteredCommands() { return registeredCommands; }

int databases(int argc, const char **argv, const Command &command) {
    (void)argc;
    (void)argv;
    (void)command;
    Debug(Debug::INFO) << "Available prebuilt databases:\n";
    for (size_t i = 0; i < externalDownloads.size(); ++i) {
        Debug(Debug::INFO) << "  " << externalDownloads[i].name << "\t"
                           << externalDownloads[i].description << "\n"
                           << "    " << externalDownloads[i].url << "\n";
    }
    Debug(Debug::INFO)
        << "Downloading requires network access; fetch the archives from "
           "the URLs above and unpack them into the target directory.\n";
    return 0;
}

// ---- base64 (RFC 4648), used for b64: masked CLI arguments ---------- //
static const char B64_CHARS[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

std::string base64_encode(const char *data, size_t len) {
    std::string out;
    out.reserve((len + 2) / 3 * 4);
    for (size_t i = 0; i < len; i += 3) {
        unsigned int v = (unsigned char)data[i] << 16;
        if (i + 1 < len) v |= (unsigned char)data[i + 1] << 8;
        if (i + 2 < len) v |= (unsigned char)data[i + 2];
        out += B64_CHARS[(v >> 18) & 63];
        out += B64_CHARS[(v >> 12) & 63];
        out += (i + 1 < len) ? B64_CHARS[(v >> 6) & 63] : '=';
        out += (i + 2 < len) ? B64_CHARS[v & 63] : '=';
    }
    return out;
}

std::string base64_decode(const char *data, size_t len) {
    int table[256];
    memset(table, -1, sizeof(table));
    for (int i = 0; i < 64; ++i) {
        table[(unsigned char)B64_CHARS[i]] = i;
    }
    std::string out;
    unsigned int buf = 0;
    int bits = 0;
    for (size_t i = 0; i < len; ++i) {
        int v = table[(unsigned char)data[i]];
        if (v < 0) continue;
        buf = (buf << 6) | (unsigned int)v;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            out += (char)((buf >> bits) & 0xFF);
        }
    }
    return out;
}
