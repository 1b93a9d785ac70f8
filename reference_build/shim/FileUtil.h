// Shim: filesystem helpers matching the mmseqs FileUtil interface.
#ifndef SHIM_FILEUTIL_H
#define SHIM_FILEUTIL_H

#include <sys/stat.h>
#include <sys/types.h>

#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>

#include "Debug.h"

class FileUtil {
public:
    static bool fileExists(const char *path) {
        struct stat st;
        return stat(path, &st) == 0 && S_ISREG(st.st_mode);
    }

    static bool directoryExists(const char *path) {
        struct stat st;
        return stat(path, &st) == 0 && S_ISDIR(st.st_mode);
    }

    static bool makeDir(const char *path, const int mode = 0777) {
        return mkdir(path, mode) == 0 || directoryExists(path);
    }

    static size_t getFileSize(const std::string &path) {
        struct stat st;
        if (stat(path.c_str(), &st) != 0) {
            return (size_t)-1;
        }
        return (size_t)st.st_size;
    }

    static void copyFile(const char *src, const char *dst) {
        std::ifstream in(src, std::ios::binary);
        std::ofstream out(dst, std::ios::binary);
        out << in.rdbuf();
    }

    static void copyFile(const std::string &src, const std::string &dst) {
        copyFile(src.c_str(), dst.c_str());
    }

    static FILE *openFileOrDie(const char *fileName, const char *mode,
                               bool shouldExist) {
        FILE *f = fopen(fileName, mode);
        if (f == NULL && shouldExist) {
            Debug(Debug::ERROR) << "Cannot open file " << fileName << "\n";
            EXIT(EXIT_FAILURE);
        }
        return f;
    }

    static void deleteFile(const std::string &file) {
        remove(file.c_str());
    }
};

#endif
